"""Vectorized joint log-density for the temporal AME model.

The probabilistic-programming surface of the framework: the model family
(AR(1) latent state-space prior + bilinear dyadic Gaussian likelihood) is
expressed as pure batched log-density functions over the full latent tensor
``X : (n, T, d)``.  These power the HMC and SMC backends and have no
counterpart in the reference (which only ever evaluates its ELBO terms via
Python loops, ``naive_mf.py:114-191``).

All functions are jit/vmap/grad-compatible and O(n^2 T) einsum work on
device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from tame.models.params import AMEParams
from tame.ops import dyad as dyad_ops
from tame.ops.dyad import HIGHEST

_LOG2PI = 1.8378770664093453


class LogProbConstants(NamedTuple):
    """Inverses and log-determinants precomputed from model params."""

    Sigma0_inv: Array
    Q_inv: Array
    R_inv: Array
    logdet_Sigma0: Array
    logdet_Q: Array
    logdet_R: Array


def precompute(params: AMEParams) -> LogProbConstants:
    return LogProbConstants(
        Sigma0_inv=jnp.linalg.inv(params.Sigma0),
        Q_inv=jnp.linalg.inv(params.Q),
        R_inv=params.R_inv,
        logdet_Sigma0=jnp.linalg.slogdet(params.Sigma0)[1],
        logdet_Q=jnp.linalg.slogdet(params.Q)[1],
        logdet_R=jnp.linalg.slogdet(params.R)[1],
    )


def log_prior(params: AMEParams, X: Array,
              consts: LogProbConstants | None = None) -> Array:
    """log p(X): initial-state prior + AR(1) transitions, all nodes/times.

    ``X`` has shape (n, T, d).
    """
    if consts is None:
        consts = precompute(params)
    n, T, d = X.shape

    x0 = X[:, 0]
    quad0 = jnp.einsum("ia,ab,ib->", x0, consts.Sigma0_inv, x0,
                       preferred_element_type=jnp.float32,
                       precision=HIGHEST)
    lp = -0.5 * (quad0 + n * (consts.logdet_Sigma0 + d * _LOG2PI))

    if T > 1:
        resid = X[:, 1:] - jnp.matmul(X[:, :-1], params.Phi.T,
                                      precision=HIGHEST)
        quadt = jnp.einsum("ita,ab,itb->", resid, consts.Q_inv, resid,
                           preferred_element_type=jnp.float32,
                           precision=HIGHEST)
        lp = lp - 0.5 * (quadt
                         + n * (T - 1) * (consts.logdet_Q + d * _LOG2PI))
    return lp


def log_likelihood(params: AMEParams, Y: Array, X: Array,
                   consts: LogProbConstants | None = None,
                   obs_mask: Array | None = None,
                   family=None) -> Array:
    """log p(Y | X) over unordered pairs i < j and all t.
    ``Y``: (n, n, T, 2), ``X``: (n, T, d).

    ``obs_mask`` (n, n, T; symmetric, zero diagonal) restricts the
    likelihood to observed dyads — the missing-data surface shared with
    ``fit_cavi(mask=...)``; masked entries of Y are never read.

    ``family`` selects the dyadic observation model
    (:mod:`tame.models.likelihoods`): ``None``/``"gaussian"`` is the
    reference's bivariate Gaussian (kept on the hand-fused exchangeable-R
    quadratic-form path); ``"poisson"``/``"bernoulli"``/a custom family
    object route through the declarative seam.
    """
    if consts is None:
        consts = precompute(params)
    n, T, d = X.shape
    r = (d - 2) // 2
    if obs_mask is not None:
        # Sanitize BEFORE the residual: NaN-coded missing entries must
        # never enter the graph — gating only the output still leaks NaN
        # through the VJP (0 cotangent * NaN residual = NaN gradient).
        Y = jnp.where(obs_mask[..., None] > 0, Y, 0.0)
    mu = dyad_ops.dyadic_mean_temporal(X, r)
    if obs_mask is None:
        mask = dyad_ops.offdiag_mask(n)[:, :, None]
        n_dyads = jnp.asarray(n * (n - 1) // 2 * T, Y.dtype)
    else:
        mask = obs_mask * dyad_ops.offdiag_mask(n)[:, :, None]
        n_dyads = 0.5 * jnp.sum(mask)
    if family is not None and getattr(family, "name", family) != "gaussian":
        from tame.models.likelihoods import get_family

        mask = jnp.broadcast_to(mask, Y.shape[:3])
        return get_family(family).log_prob(params, Y, mu, mask)
    resid = Y - mu
    quad = jnp.einsum("ijta,ab,ijtb->ijt", resid, consts.R_inv, resid,
                      preferred_element_type=jnp.float32,
                      precision=HIGHEST)
    quad_sum = 0.5 * jnp.sum(quad * mask)  # i<j sum = half the offdiag sum
    return -0.5 * (quad_sum + n_dyads * (consts.logdet_R + 2.0 * _LOG2PI))


def log_joint(params: AMEParams, Y: Array, X: Array,
              consts: LogProbConstants | None = None,
              obs_mask: Array | None = None,
              family=None) -> Array:
    """log p(Y, X) — the HMC/SMC target up to the constant log p(Y)."""
    if consts is None:
        consts = precompute(params)
    return (log_prior(params, X, consts)
            + log_likelihood(params, Y, X, consts, obs_mask=obs_mask,
                             family=family))


def make_logdensity_fn(params: AMEParams, Y: Array,
                       obs_mask: Array | None = None,
                       family=None):
    """Close over data: return ``X -> log p(Y, X)`` for samplers.

    ``obs_mask`` makes the target a missing-data posterior (observed
    dyads only) — the samplers then draw from the same posterior the
    masked CAVI engines approximate.

    ``family`` declares the dyadic observation model
    (:mod:`tame.models.likelihoods`): e.g. ``family="poisson"`` makes
    this the posterior of a count-network AME — NUTS/HMC/SMC then sample
    it unchanged (the CAVI engines are Gaussian-only by construction;
    their closed-form updates are the Gaussian conjugacy).
    """
    consts = precompute(params)
    if obs_mask is not None:
        obs_mask = obs_mask * (
            1.0 - jnp.eye(Y.shape[0], dtype=Y.dtype)[:, :, None])
    if family is not None:
        from tame.models.likelihoods import get_family

        family = get_family(family)

    def logdensity(X: Array) -> Array:
        return log_joint(params, Y, X, consts, obs_mask=obs_mask,
                         family=family)

    return logdensity
