"""Identifiability alignment: Procrustes rotation + sign flips.

Latent-space AME models are identified only up to rotation/sign of the
latent positions; these utilities align estimates against ground truth
before error computation.  Functional equivalents of the reference's
``src/utils/alignment.py`` — same algorithms (SVD Procrustes with reflection
fix at ``alignment.py:31-100``, per-row sign alignment at
``alignment.py:103-164``, per-time temporal alignment at
``alignment.py:224-321``) but fully vectorized: sign flips are a masked
``where`` instead of row loops, and the per-time path is ``vmap`` over T.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from tame.ops.dyad import HIGHEST


def procrustes_alignment(X_est: Array, X_true: Array, scaling: bool = False
                         ) -> Tuple[Array, Array]:
    """Orthogonal Procrustes: rotation R minimizing ``||X_true - X_est R||``.

    ``R = U V'`` from the SVD of ``X_est' X_true``, with the reflection fixed
    so ``det(R) = +1``; optionally also the optimal scale (reference
    ``alignment.py:31-100``).

    .. note:: **Deliberate divergence from the reference.**  The reference
       computes the SVD of ``X_true' X_est`` (``alignment.py:76``), which
       yields the *transposed* (inverse) rotation; its own unit test
       ``tests/test_utils.py::TestAlignment::test_procrustes_alignment``
       fails when run against it.  This implementation uses the correct
       cross-covariance ``X_est' X_true`` (Schonemann 1966) and recovers
       known rotations exactly.

    Returns ``(X_aligned, R)``.
    """
    X_est = jnp.asarray(X_est)
    X_true = jnp.asarray(X_true)
    M = jnp.matmul(X_est.T, X_true, precision=HIGHEST)
    U, S, Vt = jnp.linalg.svd(M, full_matrices=False)
    R = jnp.matmul(U, Vt, precision=HIGHEST)
    # Reflection fix without data-dependent control flow.
    flip = jnp.where(jnp.linalg.det(R) < 0, -1.0, 1.0)
    Vt_fixed = Vt.at[-1, :].multiply(flip)
    R = jnp.matmul(U, Vt_fixed, precision=HIGHEST)
    X_aligned = jnp.matmul(X_est, R, precision=HIGHEST)
    if scaling:
        num = jnp.trace(jnp.matmul(X_true.T, X_aligned, precision=HIGHEST))
        den = jnp.trace(jnp.matmul(X_aligned.T, X_aligned, precision=HIGHEST))
        s = jnp.where(den > 1e-10, num / jnp.maximum(den, 1e-10), 1.0)
        X_aligned = X_aligned * s
    return X_aligned, R


def align_signs(X_est: Array, X_true: Array, dim: int = -1) -> Array:
    """Flip the sign of each slice along ``dim`` when that reduces L2
    distance to the target.

    ``||x - t||^2 - ||-x - t||^2 = -4 <x, t>`` so a slice flips exactly when
    its inner product with the target is negative — one masked ``where``
    instead of the reference's per-slice loop (``alignment.py:135-162``).
    The reference treats ``dim=-1`` (and the last axis) as "flip whole rows
    of the leading axis"; we reproduce that.
    """
    X_est = jnp.asarray(X_est)
    X_true = jnp.asarray(X_true)
    if dim == -1 or dim == X_est.ndim - 1:
        axes = tuple(range(1, X_est.ndim))
        dots = jnp.sum(X_est * X_true, axis=axes, keepdims=True)
        return jnp.where(dots < 0, -X_est, X_est)
    axes = tuple(a for a in range(X_est.ndim) if a != dim)
    dots = jnp.sum(X_est * X_true, axis=axes, keepdims=True)
    return jnp.where(dots < 0, -X_est, X_est)


def align_latent_positions(M_est: Array, M_true: Array, latent_dim: int
                           ) -> Array:
    """Align multiplicative effects ``M = [U, V]``: Procrustes on U and V
    separately, then per-row sign alignment (reference
    ``alignment.py:167-221``)."""
    r = latent_dim
    M_est = jnp.asarray(M_est)
    M_true = jnp.asarray(M_true)
    U_aligned, _ = procrustes_alignment(M_est[:, :r], M_true[:, :r])
    V_aligned, _ = procrustes_alignment(M_est[:, r:], M_true[:, r:])
    U_aligned = align_signs(U_aligned, M_true[:, :r], dim=1)
    V_aligned = align_signs(V_aligned, M_true[:, r:], dim=1)
    return jnp.concatenate([U_aligned, V_aligned], axis=1)


def _align_snapshot(X_t_est: Array, X_t_true: Array, r: int) -> Array:
    """Align one time slice: signs for additive, Procrustes+signs for
    multiplicative."""
    A_aligned = align_signs(X_t_est[:, :2], X_t_true[:, :2], dim=1)
    M_aligned = align_latent_positions(X_t_est[:, 2:], X_t_true[:, 2:], r)
    return jnp.concatenate([A_aligned, M_aligned], axis=1)


def align_temporal_states(X_est: Array, X_true: Array, latent_dim: int,
                          align_each_time: bool = True) -> Array:
    """Align state trajectories (n, T, d) against truth.

    ``align_each_time=True`` aligns every time step independently (vmap over
    T — reference ``alignment.py:268-289``); ``False`` computes one global
    rotation from time-averaged states and applies it everywhere
    (``alignment.py:290-319``).
    """
    X_est = jnp.asarray(X_est)
    X_true = jnp.asarray(X_true)
    r = latent_dim
    if align_each_time:
        aligned_t = jax.vmap(lambda e, t: _align_snapshot(e, t, r),
                             in_axes=(1, 1), out_axes=1)(X_est, X_true)
        return aligned_t

    M_mean_est = X_est.mean(axis=1)[:, 2:]
    M_mean_true = X_true.mean(axis=1)[:, 2:]
    _, R_M = procrustes_alignment(M_mean_est, M_mean_true)

    def per_time(Xe_t, Xt_t):
        A_aligned = align_signs(Xe_t[:, :2], Xt_t[:, :2], dim=1)
        M_rot = jnp.matmul(Xe_t[:, 2:], R_M, precision=HIGHEST)
        M_aligned = align_signs(M_rot, Xt_t[:, 2:], dim=1)
        return jnp.concatenate([A_aligned, M_aligned], axis=1)

    return jax.vmap(per_time, in_axes=(1, 1), out_axes=1)(X_est, X_true)


def compute_alignment_error(X_est: Array, X_true: Array,
                            latent_dim: Optional[int] = None,
                            align: bool = True) -> Tuple[float, Array]:
    """MSE after optimal alignment; returns ``(error, X_aligned)``
    (reference ``alignment.py:324-385``)."""
    X_est = jnp.asarray(X_est)
    X_true = jnp.asarray(X_true)
    if align:
        if X_est.ndim == 3:
            if latent_dim is None:
                raise ValueError(
                    "latent_dim must be provided for temporal alignment")
            X_aligned = align_temporal_states(X_est, X_true, latent_dim)
        elif X_est.ndim == 2:
            if latent_dim is not None:
                M_aligned = align_latent_positions(
                    X_est[:, 2:], X_true[:, 2:], latent_dim)
                A_aligned = align_signs(X_est[:, :2], X_true[:, :2], dim=1)
                X_aligned = jnp.concatenate([A_aligned, M_aligned], axis=1)
            else:
                X_aligned = align_signs(X_est, X_true, dim=1)
        else:
            X_aligned = X_est
    else:
        X_aligned = X_est
    error = float(jnp.mean((X_aligned - X_true) ** 2))
    return error, X_aligned


def compute_correlation_after_alignment(X_est: Array, X_true: Array,
                                        latent_dim: Optional[int] = None
                                        ) -> float:
    """Pearson correlation between aligned estimates and truth
    (reference ``alignment.py:388-436``)."""
    _, X_aligned = compute_alignment_error(X_est, X_true, latent_dim,
                                           align=True)
    x = jnp.ravel(X_aligned)
    t = jnp.ravel(jnp.asarray(X_true))
    xc = x - x.mean()
    tc = t - t.mean()
    den = jnp.sqrt(jnp.sum(xc ** 2) * jnp.sum(tc ** 2))
    corr = jnp.where(den < 1e-10, 0.0, jnp.sum(xc * tc) / jnp.maximum(den, 1e-10))
    return float(corr)
