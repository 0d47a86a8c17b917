"""Smoothed (joint-trajectory) variational E-steps for non-Gaussian
dyadic families.

The mean-field non-Gaussian engines (``binary_cavi``, ``poisson_cavi``)
factor q over (node, time) — their posteriors carry no lag-1
cross-covariances, so using them as an EM E-step biases the dynamics
M-steps toward zero autocorrelation (the same argument that makes the
Gaussian EM use the smoothed engine; see ``tame/inference/em.py``).
This module closes that gap: the SAME quadratic pseudo-likelihood
reductions those engines use (Jaakkola-Jordan bound for Bernoulli, the
CVI surrogate for Poisson — ``binary_cavi.weighted_obs_terms``) feed the
block-tridiagonal trajectory smoother (``tame.ops.tridiag``) instead of
the per-time solve:

    D_t = P_obs[t] + [t=0] Sigma0^-1 + [t>0] Q^-1 + [t<T-1] Phi'Q^-1 Phi
    O   = -Phi' Q^-1
    b_t = eta_obs[t]

so each node's whole trajectory is one joint Gaussian with exact
marginal covariances AND lag-1 cross-covariances — precisely the
sufficient statistics :func:`tame.inference.em.em_update_params` needs
for the phi/Q/Sigma0 M-steps.  The R M-step is Gaussian-specific and
does not apply to these families (their dyadic "noise" is the
likelihood itself).

The objective per iteration is the family's variational objective with
the smoothed family's exact cross-time prior terms and trajectory
entropy (:func:`tame.inference.smoothed.smoothed_prior_entropy`): a true
ELBO for Poisson (exact expected log-likelihood), the JJ lower bound
for Bernoulli.  The loop is the same guarded ascent as
``poisson_cavi`` (revert + step-scale halving on regression) — the CVI
weights are unbounded, and the guard is cheap insurance for the JJ
case too.

The reference has no counterpart to any of this — it neither supports
non-Gaussian dyads nor estimates hyperparameters
(`/root/reference/src/inference/naive_mf.py:114-132`, engines take all
hyperparameters from the model object).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from tame.inference import cavi
from tame.inference.binary_cavi import (
    _predictor_moments,
    weighted_obs_terms,
)
from tame.inference.smoothed import (
    SmoothedState,
    smoothed_prior_entropy,
    warm_init_smoothed_state,
)
from tame.models.params import AMEParams
from tame.ops import dyad as dyad_ops
from tame.ops.tridiag import block_tridiag_smoother

FAMILIES = ("bernoulli", "poisson")


class SmoothedFamilyResult(NamedTuple):
    state: SmoothedState
    elbo_history: Array   # (buf,) objective value (NaN past stopping)
    n_iter: Array
    converged: Array
    diverged: Array


def warm_init_smoothed_family(Y: Array, params: AMEParams, family,
                              obs_mask: Optional[Array] = None
                              ) -> SmoothedState:
    """Link-linearized warm start: transform the observations into
    pseudo-Gaussian observations of the predictor (logit linearization
    ``4 (y - 1/2)`` for Bernoulli, ``log(y + 1/2)`` for Poisson — the
    same transforms the mean-field engine classes use) and run the
    closed-form Gaussian warm start.

    Custom family objects may declare ``warm_transform(Y) -> Z``
    (pseudo-Gaussian observations of the predictor); without one the
    raw observations are used (a first-order identity link)."""
    if family == "bernoulli":
        Z = 4.0 * (Y - 0.5)
    elif family == "poisson":
        Z = jnp.log(Y + 0.5)
    elif isinstance(family, str):
        raise ValueError(f"unknown family {family!r}; choose from "
                         f"{FAMILIES}")
    elif hasattr(family, "warm_transform"):
        Z = family.warm_transform(Y)
    else:
        Z = Y
    return warm_init_smoothed_state(Z, params, obs_mask=obs_mask)


def _evaluate(family, state: SmoothedState, y0, offd, pri, params):
    r = (state.X_mean.shape[-1] - 2) // 2
    m, var = _predictor_moments(state, r)
    loglik, w, s = family.vi_surrogate(y0, offd, m, var)
    prior0, priort, entropy = smoothed_prior_entropy(params, pri, state)
    return loglik + prior0 + priort + entropy, w, s


def _smoothed_update(state: SmoothedState, w: Array, s: Array,
                     pri, params: AMEParams, lr: Array) -> SmoothedState:
    """Exact per-node trajectory re-solve against the weighted
    observation terms (cf. ``smoothed.smoothed_step``): damping applies
    to the means only; covariances refresh from each solve."""
    n, T, d = state.X_mean.shape
    r = (d - 2) // 2
    P_obs, eta_obs = weighted_obs_terms(state.X_mean, r, w, s,
                                        cov=state.X_cov)
    D = P_obs + cavi._prior_precision(pri, T)[None]
    O = -pri.Qinv_Phi.T
    out = jax.vmap(lambda Di, bi: block_tridiag_smoother(Di, O, bi))(
        D, eta_obs)
    X_mean = lr * out.mean + (1.0 - lr) * state.X_mean
    return SmoothedState(X_mean=X_mean.astype(state.X_mean.dtype),
                         X_cov=out.cov, X_cross=out.cross_cov,
                         logdets=out.logdet)


def fit_smoothed_family(Y: Array, params: AMEParams,
                        init: SmoothedState, *, family: str,
                        max_iter: int = 150, learning_rate=0.7,
                        tolerance=1e-5, patience: int = 3,
                        mask: Optional[Array] = None
                        ) -> SmoothedFamilyResult:
    """Fit the smoothed variational family to a non-Gaussian network
    inside one compiled guarded loop.

    ``Y``: the (n, n, T, 2) reciprocal layout (component 0 — the full
    ordered adjacency — is read); ``family``: ``"bernoulli"``,
    ``"poisson"``, or ANY object implementing the ``vi_surrogate``
    protocol (``tame.models.likelihoods`` module docstring) — the seam
    that gives custom declared likelihoods trajectory-smoothed VI (and,
    through ``fit_em(family=...)``, dynamics EM) without touching the
    engine; ``mask``: optional (n, n, T) observation gate (missing
    dyads are never read, NaN-coding safe).

    The family object is a static (hashable) argument of the compiled
    loop: reuse ONE instance across calls to avoid recompilation.
    """
    family = _resolve_family(family)
    buf = 64
    while buf < max_iter:
        buf *= 2
    return _fit_family_impl(Y, params, init, jnp.asarray(max_iter),
                            jnp.asarray(learning_rate, jnp.float32),
                            jnp.asarray(tolerance, jnp.float32),
                            family=family, buf_size=buf,
                            patience=patience, mask=mask)


_FAMILY_SINGLETONS: dict = {}


def _resolve_family(family):
    """Resolve names to CACHED singleton instances (the family is a
    static jit argument — a fresh instance per call would recompile)
    and validate the protocol on custom objects."""
    if isinstance(family, str):
        if family not in _FAMILY_SINGLETONS:
            from tame.models.likelihoods import get_family

            fam = get_family(family)
            if not hasattr(fam, "vi_surrogate"):
                raise ValueError(
                    f"family {family!r} declares no vi_surrogate — no "
                    f"VI path (built-ins with one: {FAMILIES})")
            _FAMILY_SINGLETONS[family] = fam
        return _FAMILY_SINGLETONS[family]
    if not hasattr(family, "vi_surrogate"):
        raise ValueError(
            "custom family must implement vi_surrogate(y0, offd, m, "
            "var) -> (loglik, w, s); see tame.models.likelihoods")
    return family


@functools.partial(jax.jit, static_argnames=("family", "buf_size",
                                             "patience"))
def _fit_family_impl(Y, params, init, max_iter, lr, tol, *,
                     family, buf_size: int, patience: int,
                     mask=None) -> SmoothedFamilyResult:
    n, _, T, _ = Y.shape
    offd = jnp.broadcast_to(dyad_ops.offdiag_mask(n)[:, :, None],
                            (n, n, T))
    if mask is not None:
        offd = offd * jnp.asarray(mask, jnp.float32)
    # where (not multiplication): NaN-coded missing entries stay unread
    y0 = jnp.where(offd > 0, Y[..., 0], 0.0)
    pri = cavi.precompute_priors(params)

    def cond(carry):
        (state, base, e_base, scale, it, pat, conv, div, eh) = carry
        running = jnp.logical_not(jnp.logical_or(conv, div))
        return jnp.logical_and(it < max_iter, running)

    def body(carry):
        (state, base, e_base, scale, it, pat, conv, div, eh) = carry
        elbo, w, s = _evaluate(family, state, y0, offd, pri, params)
        slack = 1e-4 * jnp.abs(e_base) + 1.0
        bad = jnp.logical_or(
            jnp.logical_not(jnp.isfinite(elbo)),
            jnp.logical_and(jnp.isfinite(e_base), elbo < e_base - slack))
        nxt = jax.tree_util.tree_map(
            lambda a_, b_: jnp.where(bad, b_, a_), state, base)
        e_nxt = jnp.where(bad, e_base, elbo)
        scale = jnp.where(bad, 0.5 * scale,
                          jnp.minimum(1.25 * scale, 1.0))
        # rejected iterate: its pseudo-likelihood terms are stale —
        # recompute for the base state
        w, s = jax.lax.cond(
            bad,
            lambda: _evaluate(family, nxt, y0, offd, pri, params)[1:],
            lambda: (w, s))
        prop = _smoothed_update(nxt, w, s, pri, params, lr * scale)

        eh = eh.at[it].set(e_nxt)
        rel = jnp.abs(e_nxt - e_base) / (jnp.abs(e_base) + 1e-8)
        small = jnp.logical_and(jnp.isfinite(e_base), rel < tol)
        pat = jnp.where(bad, pat, jnp.where(small, pat + 1, 0))
        conv = pat >= patience
        div = jnp.logical_and(bad, scale < 1e-3)
        return (prop, nxt, e_nxt, scale, it + 1, pat, conv, div, eh)

    nanbuf = jnp.full((buf_size,), jnp.nan, jnp.float32)
    carry = (init, init, jnp.asarray(-jnp.inf, jnp.float32),
             jnp.asarray(1.0, jnp.float32), jnp.asarray(0),
             jnp.asarray(0), jnp.asarray(False), jnp.asarray(False),
             nanbuf)
    out = jax.lax.while_loop(cond, body, carry)
    (_, last, _, _, it, pat, conv, div, eh) = out
    return SmoothedFamilyResult(state=last, elbo_history=eh, n_iter=it,
                                converged=conv, diverged=div)
