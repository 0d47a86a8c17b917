"""Micro-probe: HBM cost of the eta contraction in (i,j,t) vs (t,i,j) layout.

Times K back-to-back contractions inside one compiled program (carry-chained
so XLA cannot elide them), divides by K.  Run on the TPU.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N, T, R, K = 2000, 50, 4, 10


def bench(label, fn, *args):
    out = fn(*args)
    np.asarray(out)                      # warm-up + compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / K * 1e3
    gb = N * N * T * 2 / 1e9
    print(f"{label}: {per:.2f} ms/pass  ({gb / per * 1e3:.0f} GB/s effective)",
          flush=True)


key = jax.random.PRNGKey(0)
W_ijt = jax.random.normal(key, (N, N, T), jnp.bfloat16)
W_tij = jax.jit(lambda w: jnp.moveaxis(w, -1, 0).copy())(W_ijt)
Z_jtr = jax.random.normal(key, (N, T, R), jnp.float32)
Z_tjr = jnp.moveaxis(Z_jtr, 1, 0)


@jax.jit
def eta_ijt(W, Z):
    def body(z, _):
        out = jnp.einsum("ijt,jtr->itr", W, z.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return out / (1.0 + jnp.max(jnp.abs(out))), None
    z, _ = jax.lax.scan(body, Z, None, length=K)
    return z


@jax.jit
def eta_tij(W, Z):
    def body(z, _):
        out = jnp.einsum("tij,tjr->tir", W, z.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return out / (1.0 + jnp.max(jnp.abs(out))), None
    z, _ = jax.lax.scan(body, Z, None, length=K)
    return z


print("devices:", jax.devices(), flush=True)
bench("einsum ijt,jtr->itr (current)", eta_ijt, W_ijt, Z_jtr)
bench("einsum tij,tjr->tir (batched) ", eta_tij, W_tij, Z_tjr)
