"""Probe 2: which formulation of the eta contraction streams at HBM speed.

All variants compute (T, n, n) @ (T, n, r)-class work on 400 MB of bf16
weights; times are per pass over the weights.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N, T, R, K = 2000, 50, 4, 10
GB = N * N * T * 2 / 1e9


def bench(label, fn, *args):
    out = fn(*args)
    np.asarray(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / K * 1e3
    print(f"{label}: {per:.2f} ms/pass ({GB / per * 1e3:.0f} GB/s)",
          flush=True)


key = jax.random.PRNGKey(0)
W_tij = jax.random.normal(key, (T, N, N), jnp.bfloat16)
Z_tjr = jax.random.normal(key, (T, N, R), jnp.float32)
Z_pad = jax.random.normal(key, (T, N, 128), jnp.float32)
W_flat = W_tij.reshape(T * N, N)      # contiguous rows; per-t RHS broken
Z_one = jax.random.normal(key, (N, R), jnp.float32)


def looped(fn, Z):
    @jax.jit
    def run(W, Z):
        def body(z, _):
            out = fn(W, z.astype(jnp.bfloat16))
            return (z * 0.999).astype(Z.dtype), out[(0,) * out.ndim]
        _, outs = jax.lax.scan(body, Z, None, length=K)
        return outs
    return run


bench("bmm r=4        ", looped(
    lambda W, z: jnp.einsum("tij,tjr->tir", W, z,
                            preferred_element_type=jnp.float32), Z_tjr),
    W_tij, Z_tjr)
bench("bmm r=128 pad  ", looped(
    lambda W, z: jnp.einsum("tij,tjr->tir", W, z,
                            preferred_element_type=jnp.float32), Z_pad),
    W_tij, Z_pad)
bench("bmm bf16 out   ", looped(
    lambda W, z: jnp.einsum("tij,tjr->tir", W, z), Z_tjr), W_tij, Z_tjr)
bench("flat (TN,N)@(N,r)", looped(
    lambda W, z: W @ z, Z_one), W_flat, Z_one)
bench("row-sum only   ", looped(
    lambda W, z: jnp.sum(W.astype(jnp.float32), axis=2) * z[0, 0, 0], Z_tjr),
    W_tij, Z_tjr)
