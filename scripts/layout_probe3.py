"""Probe 3: eta-contraction variants with REAL data dependence.

Probe 2 was invalid: its scan carry did not depend on the contraction
output, so XLA dead-code-eliminated the matmuls and every variant measured
pure tunnel RPC.  Here every iteration's input depends on the previous
output, the final fetch depends on every element, and K=25 amortizes the
~25-35 ms dispatch cost.

Variants: the current XLA einsum in both layouts, a pure row-sum (the
streaming-bandwidth ceiling), and a Pallas kernel that tiles W over
(t, i-block) and does one MXU dot per tile.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

N, T, R, K = 2000, 50, 4, 25
GB = N * N * T * 2 / 1e9
BI = 200  # must divide N and be a multiple of 8 (Mosaic block rule)
RP = 128


def bench(label, run, *args):
    np.asarray(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / K * 1e3
    print(f"{label}: {per:.2f} ms/pass ({GB / per * 1e3:.0f} GB/s) "
          f"[total {best * 1e3:.0f} ms]", flush=True)


def chained(fn, Z0):
    """Loop fn K times; each input depends on the previous full output."""
    @jax.jit
    def run(W, Z):
        def body(z, _):
            out = fn(W, z)
            # renormalize to keep values sane; depends on EVERY element
            z2 = out / (1.0 + jnp.sqrt(jnp.mean(out * out)))
            return z2.astype(Z.dtype), ()
        z, _ = jax.lax.scan(body, Z, None, length=K)
        return z
    return run


key = jax.random.PRNGKey(0)
W_ijt = jax.random.normal(key, (N, N, T), jnp.bfloat16)
W_tij = jax.jit(lambda w: jnp.moveaxis(w, -1, 0).copy())(W_ijt)
Z_jtr = jax.random.normal(key, (N, T, R), jnp.float32)
Z_tjr = jax.jit(lambda z: jnp.moveaxis(z, 1, 0).copy())(Z_jtr)

print("devices:", jax.devices(), flush=True)

# 1. current einsum, (i,j,t) layout
bench("einsum ijt   ", chained(
    lambda W, z: jnp.einsum("ijt,jtr->itr", W, z.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32), Z_jtr),
    W_ijt, Z_jtr)

# 2. batched matmul, (t,i,j) layout
bench("einsum tij   ", chained(
    lambda W, z: jnp.einsum("tij,tjr->tir", W, z.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32), Z_tjr),
    W_tij, Z_tjr)


# 3. streaming ceiling: row-sum, output folded back into a (T,N,R) carry
def rowsum(W, z):
    s = jnp.sum(W.astype(jnp.float32), axis=2)            # (T, N)
    return s[..., None] + z * 1e-6


bench("row-sum ceil ", chained(rowsum, Z_tjr), W_tij, Z_tjr)


# 4. Pallas: grid (T, N/BI); W tile (BI, N) -> one MXU dot vs Z (N, RP)
def _eta_kernel(W_ref, Z_ref, out_ref):
    out_ref[...] = jnp.dot(
        W_ref[0], Z_ref[0],
        preferred_element_type=jnp.float32)[None]


@jax.jit
def pallas_eta(W, Z):
    Zp = jnp.zeros((T, N, RP), jnp.bfloat16).at[:, :, :R].set(
        Z.astype(jnp.bfloat16))
    out = pl.pallas_call(
        _eta_kernel,
        grid=(T, N // BI),
        in_specs=[
            pl.BlockSpec((1, BI, N), lambda t, i: (t, i, 0)),
            pl.BlockSpec((1, N, RP), lambda t, i: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BI, RP), lambda t, i: (t, i, 0)),
        out_shape=jax.ShapeDtypeStruct((T, N, RP), jnp.float32),
    )(W, Zp)
    return out[:, :, :R]


bench("pallas tij   ", chained(pallas_eta, Z_tjr), W_tij, Z_tjr)

# correctness of the pallas path
ref = jnp.einsum("tij,tjr->tir", W_tij, Z_tjr.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
got = pallas_eta(W_tij, Z_tjr)
err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
print(f"pallas vs einsum rel err: {err:.2e}", flush=True)
