"""Large-scale benchmark: Good-SMF convergence wall-clock at the north-star
config (n=2000, T=50, r=4) on one chip.  Writes results to stdout and
scale_bench_result.json."""
import json
import sys
import time

import jax
import numpy as np

from tame.config import ModelConfig
from tame.inference import cavi
from tame.models import build_params, sample


def main(n=2000, T=50, r=4):
    print("connecting to device...", flush=True)
    print("devices:", jax.devices(), flush=True)
    cfg = ModelConfig(n_nodes=n, n_time=T, latent_dim=r, seed=0)
    params = build_params(cfg)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    Y, _ = sample(params, key, n, T)
    jax.block_until_ready(Y)
    t_gen = time.perf_counter() - t0
    print(f"gen {t_gen:.1f}s", flush=True)

    def fit(i):
        init = cavi.init_state(jax.random.fold_in(key, 300 + i), n, T,
                               cfg.d, "full", 0.1, 0.5)
        out = cavi.fit_cavi(Y, params, init, structure="full",
                            update_mode="block", max_iter=50,
                            learning_rate=0.8, tolerance=1e-4,
                            num_blocks=8)
        jax.block_until_ready(out)
        return out

    t0 = time.perf_counter()
    out = fit(0)
    t_compile = time.perf_counter() - t0
    print(f"compile+fit {t_compile:.1f}s (n_iter={int(out.n_iter)})",
          flush=True)

    results = []
    for i in (1, 2):
        t0 = time.perf_counter()
        out = fit(i)
        dt = time.perf_counter() - t0
        ni = int(out.n_iter)
        mse = float(np.asarray(out.mse_history)[ni - 1])
        print(f"run {i}: {ni} iters in {dt:.2f}s "
              f"({dt/ni*1000:.0f} ms/it), mse={mse:.4f}, "
              f"converged={bool(out.converged)}", flush=True)
        results.append({"iters": ni, "wall_s": dt, "mse": mse,
                        "converged": bool(out.converged)})

    # sparse-diagnostics variant: update cost only
    def fit_sparse(i):
        init = cavi.init_state(jax.random.fold_in(key, 400 + i), n, T,
                               cfg.d, "full", 0.1, 0.5)
        out = cavi.fit_cavi(Y, params, init, structure="full",
                            update_mode="block", max_iter=50,
                            learning_rate=0.8, tolerance=1e-4,
                            num_blocks=8, elbo_every=10)
        jax.block_until_ready(out)
        return out

    fit_sparse(0)
    for i in (1,):
        t0 = time.perf_counter()
        out = fit_sparse(i)
        dt = time.perf_counter() - t0
        ni = int(out.n_iter)
        print(f"sparse run: {ni} iters in {dt:.2f}s "
              f"({dt/ni*1000:.0f} ms/it with elbo_every=10)", flush=True)
        results.append({"iters": ni, "wall_s": dt,
                        "elbo_every": 10})

    with open("/root/repo/scale_bench_result.json", "w") as f:
        json.dump({"config": {"n": n, "T": T, "r": r},
                   "gen_s": t_gen, "compile_s": t_compile,
                   "runs": results}, f, indent=2)
    print("DONE", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
