"""TPU validation of the block-mode megakernel on the default engine path.

1. demo scale (n=15, T=10, r=2): default block updates must dispatch to the
   kernel (probe) and match the XLA path's fixed point.
2. n=100 (top of the VMEM envelope): compile + run must succeed under the
   raised 64 MB scoped-VMEM limit.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tame.inference import cavi
from tame.models import TemporalAMEModel


def check(n, T, r, lr, max_iter, compare=True):
    model = TemporalAMEModel(n_nodes=n, n_time=T, latent_dim=r, seed=42)
    Y, _ = model.generate_data(return_latents=True)
    init = cavi.init_state(jax.random.PRNGKey(0), n, T, 2 + 2 * r,
                           "full", 0.1, 0.5)
    kw = dict(structure="full", update_mode="block", max_iter=max_iter,
              learning_rate=lr, tolerance=0.0)

    t0 = time.perf_counter()
    fz = cavi.fit_cavi(Y, model.params, init, **kw)
    np.asarray(fz.X_mean)
    compile_s = time.perf_counter() - t0
    used = cavi.LAST_FIT_USED_FUSED
    print(f"n={n}: fused={used}, compile+run {compile_s:.1f}s, "
          f"final ELBO {float(np.asarray(fz.elbo_history)[max_iter-1]):.2f}",
          flush=True)
    assert used, "default block path did not dispatch to the megakernel"

    if compare:
        ref = cavi.fit_cavi(Y, model.params, init, fused=False, **kw)
        eh_r = np.asarray(ref.elbo_history)[:max_iter]
        eh_f = np.asarray(fz.elbo_history)[:max_iter]
        rel = np.nanmax(np.abs(eh_r - eh_f) / np.abs(eh_r))
        dm = np.max(np.abs(np.asarray(ref.X_mean) - np.asarray(fz.X_mean)))
        print(f"n={n}: ELBO rel err {rel:.2e}, max|dX_mean| {dm:.2e}",
              flush=True)
        assert rel < 1e-4 and dm < 1e-3


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    check(15, 10, 2, lr=1.0, max_iter=30, compare=True)
    check(100, 10, 2, lr=1.0, max_iter=30, compare=True)
    print("OK", flush=True)
