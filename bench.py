"""Benchmark: Good-SMF CAVI throughput on the BASELINE demo config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference implementation measured at 4.81 ELBO-iterations/s
for Good SMF (lr=0.7, 150 iters, n=15/T=10/r=2 demo config) on CPU
(BASELINE.md, measured 2026-08-17).  The fit here is a single compiled
``lax.while_loop``; timing excludes compilation (one warm-up call) and uses
``tolerance=0`` so all iterations run.
"""

import json
import time

import jax
import numpy as np

from tame.config import ModelConfig
from tame.inference import cavi
from tame.models import build_params, sample

BASELINE_ITERS_PER_S = 4.81  # reference Good SMF, BASELINE.md
N_ITERS = 150
REPEATS = 3


def main():
    cfg = ModelConfig(n_nodes=15, n_time=10, latent_dim=2,
                      ar_coefficient=0.8, rho_dyadic=0.5, seed=42)
    params = build_params(cfg)
    key = jax.random.PRNGKey(cfg.seed)
    Y, _ = sample(params, key, cfg.n_nodes, cfg.n_time)
    def run(seed_offset):
        # Distinct init per repeat defeats any result-level caching in the
        # device transport; the work measured is always a fresh fit.
        st = cavi.init_state(jax.random.fold_in(key, seed_offset),
                             cfg.n_nodes, cfg.n_time, cfg.d, "full",
                             0.1, 0.5)
        # diag_mode="stats" computes the same per-iteration ELBO/MSE from
        # global sufficient statistics (no O(n^2 T) reads) — measured 16%
        # faster than the exact-residual pass at this config, identical
        # values to float32 reduction error (tests assert 1e-4).
        out = cavi.fit_cavi(Y, params, st, structure="full",
                            update_mode="jacobi", max_iter=N_ITERS,
                            learning_rate=0.7, tolerance=0.0,
                            diag_mode="stats")
        # Host fetch: over the tunnel transport block_until_ready alone can
        # return before remote execution completes (CLAUDE.md).
        np.asarray(out.X_mean)
        assert int(out.n_iter) == N_ITERS
        return out

    run(0)  # warm-up: compile
    best = float("inf")
    for rep in range(REPEATS):
        t0 = time.perf_counter()
        run(rep + 1)
        best = min(best, time.perf_counter() - t0)

    iters_per_s = N_ITERS / best
    print(json.dumps({
        "metric": "good_smf_elbo_iterations_per_s",
        "value": round(iters_per_s, 2),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_s / BASELINE_ITERS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
