"""Validate + time the fused Pallas smoother vs the vmapped scan solver on
the real TPU at north-star scale (n=2000, T=50, d=10)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tame.ops.fused_smoother import fused_smoother
from tame.ops.tridiag import block_tridiag_smoother

n, T, d = 2000, 50, 10
key = jax.random.PRNGKey(0)
A = jax.random.normal(key, (n, T, d, d)) * 0.3
D = jnp.einsum("ntij,ntkj->ntik", A, A) + 2.0 * jnp.eye(d)
O = 0.25 * jax.random.normal(jax.random.fold_in(key, 1), (d, d))
b = jax.random.normal(jax.random.fold_in(key, 2), (n, T, d))


@jax.jit
def scan_path(D, b):
    return jax.vmap(lambda Di, bi: block_tridiag_smoother(Di, O, bi))(D, b)


@jax.jit
def fused_path(D, b):
    return fused_smoother(D, O, b)


def timeit(label, fn, reps=5):
    out = fn(D, b)
    np.asarray(out.mean)
    best = float("inf")
    for i in range(reps):
        # Vary the rhs per repeat: the device transport caches results of
        # identical (executable, inputs) pairs and would read ~0 ms
        # otherwise (CLAUDE.md).
        bi = b + jnp.float32(1e-3 * (i + 1))
        t0 = time.perf_counter()
        o = fn(D, bi)
        np.asarray(o.mean)
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best * 1e3:.2f} ms "
          f"(incl. ~25-35 ms tunnel dispatch; compare paths, not absolute "
          f"device time)", flush=True)
    return out


ref = timeit("scan ", scan_path)
got = timeit("fused", fused_path)
for name in ("mean", "cov", "cross_cov", "logdet"):
    r, g = np.asarray(getattr(ref, name)), np.asarray(getattr(got, name))
    err = np.max(np.abs(r - g)) / (np.max(np.abs(r)) + 1e-12)
    print(f"{name}: rel err {err:.2e}", flush=True)
