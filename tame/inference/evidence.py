"""Exact ELBO (a TRUE lower bound on log p(Y)) and evidence comparison.

The per-iteration "ELBO" the CAVI engines report follows the reference's
conventions for parity — a plug-in likelihood at the means plus the
structured engines' ad-hoc trace correction (SURVEY.md §2C-5,
`/root/reference/src/inference/structured_mf.py:141-148`) — which is NOT
a valid lower bound on the log evidence.  This module computes the exact
variational bound

    ELBO(q) = E_q[log p(Y | X)] + E_q[log p(X)] + H[q]

for the smoothed (joint-trajectory) family, where every term is closed
form:

* ``E_q[log p(Y|X)]`` — the expected Gaussian dyad quadratic uses the
  EXACT posterior moments of the bilinear predictor, including the
  second-order ``tr(S_i[UU] S_j[VV])`` term and the reciprocal-pair
  cross-covariances (:func:`tame.inference.em._residual_moments` /
  ``_residual_moment_corrections`` — validated against Monte-Carlo
  sampling of the posterior in the EM tests);
* prior and entropy — the smoothed family's exact cross-time terms
  (:func:`tame.inference.smoothed.smoothed_prior_entropy`).

Because this is a genuine bound, ``exact_elbo(q*) <= log p(Y)`` for ANY
q — which makes it directly comparable to the SMC log-evidence estimate
(:func:`tame.inference.smc.run_smc` ``log_evidence``): the gap
``log p(Y) - ELBO`` is the KL divergence from the variational posterior
to the true posterior.  That comparison is the scientific payoff SMC
uniquely enables (no other component of the framework estimates the
evidence itself), and the basis of the ``SMC_BENCH.json`` artifact.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import Array

from tame.inference import cavi
from tame.inference.em import (
    _residual_moment_corrections,
    _residual_moments,
)
from tame.inference.smoothed import SmoothedState, smoothed_prior_entropy
from tame.models.params import AMEParams
from tame.ops import dyad as dyad_ops

_LOG2PI = 1.8378770664093453


def exact_elbo(Y: Array, params: AMEParams, state: SmoothedState,
               mask: Optional[Array] = None) -> Array:
    """The exact evidence lower bound of a smoothed variational state.

    ``mask``: optional (n, n, T) observation gate — the bound is then on
    the OBSERVED-dyad evidence (the same likelihood the masked engines
    and samplers target).  Gaussian dyadic likelihood only (the
    non-Gaussian families' engine objectives are already true
    bounds/exact ELBOs by construction — JJ / log-normal-mean).
    """
    n, _, T, _ = Y.shape
    pri = cavi.precompute_priors(params)
    m = (jnp.broadcast_to(dyad_ops.offdiag_mask(n)[:, :, None],
                          (n, n, T)) if mask is None
         else mask * (1.0 - jnp.eye(n, dtype=Y.dtype)[:, :, None]))
    sq, cross, count = _residual_moments(Y, state.X_mean, mask)
    var_corr, cross_corr = _residual_moment_corrections(state, m)
    p_, q_ = params.R_inv[0, 0], params.R_inv[0, 1]
    quad = p_ * (sq + var_corr) + q_ * (cross + cross_corr)
    n_dyads = 0.5 * count
    log_lik = -0.5 * (quad + n_dyads * (pri.logdet_R + 2.0 * _LOG2PI))
    prior0, priort, entropy = smoothed_prior_entropy(params, pri, state)
    return log_lik + prior0 + priort + entropy
