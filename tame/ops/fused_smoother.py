"""Fused Pallas AR(1) forward-backward smoother, vmapped over nodes.

The north-star asks for the block-tridiagonal trajectory solve ("AR(1)
forward-backward smoothing") as a fused TPU kernel.  The XLA reference
implementation (:func:`tame.ops.tridiag.block_tridiag_smoother`) is a
``lax.scan`` over T of many tiny d x d ops ``vmap``-ed over nodes; this
kernel runs the whole forward elimination + backward substitution for a
tile of nodes inside ONE ``pallas_call``, with every d x d matrix entry a
``(1, NB)`` vector plane over the node tile (the same layout discipline as
``tame.ops.fused_fit``) — one VPU op per scalar step across all nodes of
the tile at once, no per-step kernel launches, state resident in VMEM.

Memory trick: the forward pass needs S_t^-1 and c_t again on the way back,
and the backward pass produces exactly one (d, d) and one (d,) quantity per
t — so the forward pass stores S_t^-1 / c_t straight into the ``cov`` /
``mean`` output refs and the backward pass overwrites them in reverse
order.  No scratch buffers at all.

Recursions (tridiag.py:73-118, identical math):

    forward:  S_t = D_t - O' S_{t-1}^-1 O,  c_t = b_t - O' S_{t-1}^-1 c_{t-1}
    backward: mu_t = S_t^-1 (c_t - O mu_{t+1})
              Sig_t = S_t^-1 + G_t Sig_{t+1} G_t',  G_t = S_t^-1 O
              Cov(X_t, X_{t+1}) = -G_t Sig_{t+1}
    logdet = sum_t logdet S_t
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 128  # node-tile width (lanes)


def fused_smoother_supported(n: int, T: int, d: int) -> bool:
    """VMEM per tile: in/out blocks are D (d^2) + cov (d^2) + cross (d^2)
    + b/mean (2d) planes of (T, NB) f32, double-buffered across grid
    steps (measured 17.5 MB at d=10, T=50); the kernel raises the scoped
    limit to 48 MB and this check keeps usage under it.  Code size
    unrolls O(d^3)."""
    if d > 12 or T < 2:
        return False
    resident = (3 * d * d + 2 * d + 2) * T * NB * 4
    return 2 * resident < 40 * 1024 * 1024


class FusedSmootherOut(NamedTuple):
    mean: Array      # (n, T, d)
    cov: Array       # (n, T, d, d)
    cross_cov: Array  # (n, T-1, d, d)  Cov(X_t, X_{t+1})
    logdet: Array    # (n,)


def _plane_inv_logdet(S, d):
    """Inverse + logdet of SPD d x d matrices whose entries are (1, NB)
    planes, via unrolled Cholesky (cf. fused_fit._plane_chol_solve)."""
    L = [[None] * d for _ in range(d)]
    inv_diag = [None] * d
    logdet = None
    for k in range(d):
        acc = S[k][k]
        for m in range(k):
            acc = acc - L[k][m] * L[k][m]
        term = jnp.log(acc)
        logdet = term if logdet is None else logdet + term
        L[k][k] = jnp.sqrt(acc)
        inv_diag[k] = 1.0 / L[k][k]
        for i in range(k + 1, d):
            a2 = S[i][k]
            for m in range(k):
                a2 = a2 - L[i][m] * L[k][m]
            L[i][k] = a2 * inv_diag[k]

    def solve_unit(j):
        # solve S x = e_j  ->  column j of S^-1
        y = [None] * d
        for i in range(d):
            acc = 1.0 if i == j else 0.0
            for m in range(i):
                acc = acc - L[i][m] * y[m]
            y[i] = acc * inv_diag[i]
        x = [None] * d
        for i in reversed(range(d)):
            acc = y[i]
            for m in range(i + 1, d):
                acc = acc - L[m][i] * x[m]
            x[i] = acc * inv_diag[i]
        return x

    Sinv = [[None] * d for _ in range(d)]
    for j in range(d):
        col = solve_unit(j)
        for i in range(d):
            Sinv[i][j] = col[i]
    return Sinv, logdet


def _matmul_planes(A, B, d):
    """(A @ B)[i][j] = sum_k A[i][k] B[k][j] on (1, NB) planes."""
    return [[sum(A[i][k] * B[k][j] for k in range(d)) for j in range(d)]
            for i in range(d)]


def _smoother_kernel(O_ref, D_ref, b_ref, mean_ref, cov_ref, cross_ref,
                     logdet_ref, *, T: int, d: int):
    def O(i, j):
        return O_ref[i, j]

    def ld(ref, i, t):
        return ref[i, pl.ds(t, 1)]           # (1, NB)

    def ld2(ref, i, j, t):
        return ref[i, j, pl.ds(t, 1)]        # (1, NB)

    # ---- forward elimination: store S_t^-1 in cov_ref, c_t in mean_ref ----
    S0 = [[ld2(D_ref, i, j, 0) for j in range(d)] for i in range(d)]
    Sinv, logdet = _plane_inv_logdet(S0, d)
    for i in range(d):
        mean_ref[i, pl.ds(0, 1)] = ld(b_ref, i, 0)
        for j in range(d):
            cov_ref[i, j, pl.ds(0, 1)] = Sinv[i][j]

    def fwd(t, logdet):
        Sinv_p = [[ld2(cov_ref, i, j, t - 1) for j in range(d)]
                  for i in range(d)]
        c_p = [ld(mean_ref, i, t - 1) for i in range(d)]
        # Ot_Sinv = O' S_{t-1}^-1   (scalar O entries x planes)
        OtS = [[sum(O(k, i) * Sinv_p[k][j] for k in range(d))
                for j in range(d)] for i in range(d)]
        S_t = [[ld2(D_ref, i, j, t)
                - sum(OtS[i][k] * O(k, j) for k in range(d))
                for j in range(d)] for i in range(d)]
        Sinv_t, ld_t = _plane_inv_logdet(S_t, d)
        for i in range(d):
            c_i = ld(b_ref, i, t) - sum(OtS[i][k] * c_p[k]
                                        for k in range(d))
            mean_ref[i, pl.ds(t, 1)] = c_i
            for j in range(d):
                cov_ref[i, j, pl.ds(t, 1)] = Sinv_t[i][j]
        return logdet + ld_t

    logdet = jax.lax.fori_loop(1, T, fwd, logdet)
    logdet_ref[...] = logdet

    # ---- backward substitution (overwrites cov/mean in reverse order) ----
    SinvT = [[ld2(cov_ref, i, j, T - 1) for j in range(d)]
             for i in range(d)]
    cT = [ld(mean_ref, i, T - 1) for i in range(d)]
    for i in range(d):
        mean_ref[i, pl.ds(T - 1, 1)] = sum(SinvT[i][k] * cT[k]
                                           for k in range(d))
    # cov_ref[.., T-1] already holds Sig_T = S_T^-1

    def bwd(s, _):
        t = T - 2 - s
        Sinv_t = [[ld2(cov_ref, i, j, t) for j in range(d)]
                  for i in range(d)]
        c_t = [ld(mean_ref, i, t) for i in range(d)]
        mu_n = [ld(mean_ref, i, t + 1) for i in range(d)]
        Sig_n = [[ld2(cov_ref, i, j, t + 1) for j in range(d)]
                 for i in range(d)]
        # mu_t = S^-1 (c - O mu_next)
        rhs = [c_t[i] - sum(O(i, k) * mu_n[k] for k in range(d))
               for i in range(d)]
        for i in range(d):
            mean_ref[i, pl.ds(t, 1)] = sum(Sinv_t[i][k] * rhs[k]
                                           for k in range(d))
        # G = S^-1 O ; GS = G Sig_next ; Sig_t = S^-1 + GS G' ; cross = -GS
        G = [[sum(Sinv_t[i][k] * O(k, j) for k in range(d))
              for j in range(d)] for i in range(d)]
        GS = _matmul_planes(G, Sig_n, d)
        for i in range(d):
            for j in range(d):
                cov_ref[i, j, pl.ds(t, 1)] = (
                    Sinv_t[i][j]
                    + sum(GS[i][k] * G[j][k] for k in range(d)))
                cross_ref[i, j, pl.ds(t, 1)] = -GS[i][j]
        return 0

    jax.lax.fori_loop(0, T - 1, bwd, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_smoother(D: Array, O: Array, b: Array,
                   interpret: bool = False) -> FusedSmootherOut:
    """Batched block-tridiagonal smooth of n independent trajectory systems.

    Same contract as ``vmap(block_tridiag_smoother)`` over nodes:
    ``D (n, T, d, d)`` SPD diagonal blocks, ``O (d, d)`` constant coupling,
    ``b (n, T, d)`` natural parameters.
    """
    n, T, d, _ = D.shape
    f32 = jnp.float32
    n_pad = ((n + NB - 1) // NB) * NB

    # (entry..., T, node) layout; padded nodes get identity systems.
    Dk = jnp.moveaxis(D.astype(f32), 0, -1).transpose(1, 2, 0, 3)
    eye_pad = jnp.broadcast_to(
        jnp.eye(d, dtype=f32)[:, :, None, None], (d, d, T, n_pad - n))
    Dk = jnp.concatenate([Dk, eye_pad], axis=-1)           # (d, d, T, n_pad)
    bk = jnp.moveaxis(b.astype(f32), 0, -1).transpose(1, 0, 2)
    bk = jnp.concatenate([bk, jnp.zeros((d, T, n_pad - n), f32)], axis=-1)

    kernel = functools.partial(_smoother_kernel, T=T, d=d)
    grid = (n_pad // NB,)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    mean, cov, cross, logdet = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            smem,
            pl.BlockSpec((d, d, T, NB), lambda i: (0, 0, 0, i)),
            pl.BlockSpec((d, T, NB), lambda i: (0, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((d, T, NB), lambda i: (0, 0, i)),
            pl.BlockSpec((d, d, T, NB), lambda i: (0, 0, 0, i)),
            pl.BlockSpec((d, d, T, NB), lambda i: (0, 0, 0, i)),
            pl.BlockSpec((1, NB), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, T, n_pad), f32),
            jax.ShapeDtypeStruct((d, d, T, n_pad), f32),
            jax.ShapeDtypeStruct((d, d, T, n_pad), f32),
            jax.ShapeDtypeStruct((1, n_pad), f32),
        ],
        # double-buffered in/out blocks at d=10, T=50 need ~17.5 MB —
        # just over the default 16 MB scoped-vmem limit; raise it (the
        # budget check in fused_smoother_supported keeps usage bounded)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(O, f32), Dk, bk)

    return FusedSmootherOut(
        mean=jnp.transpose(mean[:, :, :n], (2, 1, 0)),           # (n, T, d)
        cov=jnp.transpose(cov[:, :, :, :n], (3, 2, 0, 1)),
        cross_cov=jnp.transpose(cross[:, :, :T - 1, :n], (3, 2, 0, 1)),
        logdet=logdet[0, :n],
    )
