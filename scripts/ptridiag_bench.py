"""Time-parallel exact smoother vs the sequential scan on the real TPU.

Long-context axis (SURVEY §5): at T = 50 the sequential depth costs
microseconds, but the smoothed family's trajectory solve is O(T) deep —
this bench measures where the O(log T)-depth associative-scan smoother
(tame.ops.ptridiag) overtakes the vmapped lax.scan solver as T grows,
and validates agreement at every size.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tame.ops.ptridiag import parallel_block_tridiag_smoother
from tame.ops.tridiag import block_tridiag_smoother

d = 10
phi = 0.8
Phi = phi * jnp.eye(d)
Q = (1 - phi ** 2) * 0.1 * (jnp.eye(d) + 0.1 * jnp.ones((d, d)))
Sigma0 = jnp.eye(d)
Q_inv = jnp.linalg.inv(Q)
S0_inv = jnp.linalg.inv(Sigma0)
PQP = Phi.T @ Q_inv @ Phi
O = -Phi.T @ Q_inv


def bench(n, T, reps=5):
    key = jax.random.PRNGKey(T)
    A = jax.random.normal(key, (n, T, d, d)) * 0.3
    Pobs = jnp.einsum("ntij,ntkj->ntik", A, A) + 2.0 * jnp.eye(d)
    eta = jax.random.normal(jax.random.fold_in(key, 1), (n, T, d))
    t = jnp.arange(T)
    D = (Pobs + (t == 0)[:, None, None] * S0_inv
         + (t > 0)[:, None, None] * Q_inv
         + (t < T - 1)[:, None, None] * PQP)

    @jax.jit
    def scan_path(D, eta):
        return jax.vmap(lambda Di, bi: block_tridiag_smoother(
            Di, O, bi))(D, eta)

    @jax.jit
    def par_path(Pobs, eta):
        return jax.vmap(lambda Ji, bi: parallel_block_tridiag_smoother(
            Ji, bi, Phi, Q, Sigma0))(Pobs, eta)

    def timeit(fn, x, b):
        out = fn(x, b)
        np.asarray(out.mean[0, 0])
        best = float("inf")
        for i in range(reps):
            bi = b + jnp.float32(1e-3 * (i + 1))  # defeat result caching
            t0 = time.perf_counter()
            o = fn(x, bi)
            np.asarray(o.mean[0, 0])  # small host-fetch barrier
            best = min(best, time.perf_counter() - t0)
        return best * 1e3, out

    ms_seq, ref = timeit(scan_path, D, eta)
    ms_par, got = timeit(par_path, Pobs, eta)
    err = np.max(np.abs(np.asarray(ref.mean) - np.asarray(got.mean)))
    print(f"n={n:5d} T={T:5d}: scan {ms_seq:8.2f} ms | parallel "
          f"{ms_par:8.2f} ms | speedup {ms_seq / ms_par:5.2f}x | "
          f"max|dmean| {err:.2e}", flush=True)


for n, T in [(2000, 50), (512, 128), (256, 256), (128, 512),
             (64, 1024), (16, 4096)]:
    bench(n, T)
