"""Declarative dyadic-likelihood families.

The reference hardcodes one observation model — a bivariate Gaussian dyad
with exchangeable covariance R (``src/models/temporal_ame.py:147-220``,
``src/inference/naive_mf.py:114-132``) — and so did this framework's
log-density layer until round 4.  This module is the likelihood-plugin
seam: a family declares how dyad observations relate to the bilinear
predictor

    mu_ij^t = a_i + b_j + U_i . V_j,

and the probabilistic-programming surface (``tame.inference.logprob``,
HMC/NUTS/SMC) accepts any declared family.  The Gaussian CAVI engines
remain Gaussian-only — their closed-form coordinate updates ARE the
Gaussian conjugacy (``tame/inference/cavi.py``) — but both non-Gaussian
built-ins have dedicated VI engines (JJ-bound
``tame.inference.binary_cavi.TemporalAMEBernoulliVI``, guarded-CVI
``tame.inference.poisson_cavi.TemporalAMEPoissonVI``), smoothed
trajectory variants (``tame.inference.family_smoothed``), and EM
support (``fit_em(family=...)``).

Families ship with:

* ``log_prob(params, Y, mu, mask)`` — summed log-likelihood over
  unordered observed dyads; ``Y``/``mu`` are the (n, n, T, 2) reciprocal
  tensors, ``mask`` an (n, n, T) off-diagonal/observation gate.
  Jit/grad-compatible (drives the samplers).
* ``sample(key, params, mu)`` — dyad observations given the predictor,
  in the same reciprocal layout (``Y[i,j,t] = [y_ij, y_ji]``).
* optionally ``vi_surrogate(y0, offd, m, var)`` — the quadratic
  variational surrogate that plugs the family into the VI/EM layer
  (:func:`tame.inference.family_smoothed.fit_smoothed_family`,
  ``fit_em(family=...)``): given the per-directed-dyad observations
  ``y0`` (n, n, T), the observation gate ``offd``, and the current
  posterior predictor moments ``m``/``var``, return ``(loglik, w, s)``
  — the summed expected (or lower-bounded) log-likelihood, the per-dyad
  pseudo-precision, and the linear coefficient such that each dyad
  contributes ``s m - (w/2) m^2`` to the coordinate objective (see
  ``tame.inference.binary_cavi.weighted_obs_terms``).  A family with
  this one extra method gets trajectory-smoothed VI and dynamics EM
  for free; ``bernoulli`` implements the Jaakkola-Jordan bound,
  ``poisson`` the exact-ELBO CVI surrogate.

``gaussian`` reproduces the framework's existing likelihood exactly
(including the exchangeable-R quadratic form).  ``poisson`` (log link)
and ``bernoulli`` (logit link) model counts / binary ties with
conditionally independent directions — the reciprocity-correlation knob
is a Gaussian-R concept; for non-Gaussian dyads dependence enters
through the shared latent states.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
from jax import Array

from tame.models.params import AMEParams
from tame.ops.dyad import HIGHEST

_LOG2PI = 1.8378770664093453


class GaussianDyadic:
    """Bivariate Gaussian dyads with exchangeable covariance R — the
    reference's (and the CAVI engines') observation model."""

    name = "gaussian"

    def log_prob(self, params: AMEParams, Y: Array, mu: Array,
                 mask: Array) -> Array:
        resid = Y - mu
        p, q = params.R_inv[0, 0], params.R_inv[0, 1]
        e0, e1 = resid[..., 0], resid[..., 1]
        quad = p * (e0 * e0 + e1 * e1) + 2.0 * q * (e0 * e1)
        n_dyads = 0.5 * jnp.sum(mask)
        logdet_R = jnp.linalg.slogdet(params.R)[1]
        return -0.5 * (0.5 * jnp.sum(quad * mask)
                       + n_dyads * (logdet_R + 2.0 * _LOG2PI))

    def sample(self, key: Array, params: AMEParams, mu: Array) -> Array:
        n, _, T, _ = mu.shape
        chol = jnp.linalg.cholesky(params.R)
        eps = jnp.einsum("ab,ijtb->ijta",
                         chol, jax.random.normal(key, mu.shape),
                         precision=HIGHEST)
        # reciprocity: draw the upper triangle, mirror the swapped pair
        Yd = mu + eps
        iu = jnp.triu(jnp.ones((n, n), bool), 1)[..., None, None]
        Y = jnp.where(iu, Yd, jnp.swapaxes(Yd[..., ::-1], 0, 1))
        return Y * (1.0 - jnp.eye(n))[:, :, None, None]


class _IndependentDirections:
    """Base for families whose two dyad directions are conditionally
    independent given the latent states: the unordered-pair sum is half
    the off-diagonal sum of per-entry component-0 terms (reciprocity:
    component 1 of (i, j) is component 0 of (j, i))."""

    def _entry_log_prob(self, y: Array, mu: Array) -> Array:
        raise NotImplementedError

    def _entry_sample(self, key: Array, mu: Array) -> Array:
        raise NotImplementedError

    def log_prob(self, params: AMEParams, Y: Array, mu: Array,
                 mask: Array) -> Array:
        # Sanitize INPUTS at gated entries (never multiply a possibly
        # non-finite term by the mask): a diagonal/self predictor can
        # overflow exp() to -inf, and -inf * 0 = NaN would poison the
        # whole log-density AND its gradient (0 cotangent x inf = NaN).
        y = jnp.where(mask > 0, Y[..., 0], 0.0)
        m = jnp.where(mask > 0, mu[..., 0], 0.0)
        lp = self._entry_log_prob(y, m)
        return jnp.sum(lp * mask)

    def sample(self, key: Array, params: AMEParams, mu: Array) -> Array:
        n = mu.shape[0]
        Yf = self._entry_sample(key, mu[..., 0]).astype(mu.dtype)
        Yf = Yf * (1.0 - jnp.eye(n))[:, :, None]
        return jnp.stack([Yf, jnp.swapaxes(Yf, 0, 1)], axis=-1)


class PoissonDyadic(_IndependentDirections):
    """Count dyads: ``y_ij ~ Poisson(exp(mu_ij))`` (log link)."""

    name = "poisson"

    def _entry_log_prob(self, y, mu):
        return y * mu - jnp.exp(mu) - jax.lax.lgamma(y + 1.0)

    def _entry_sample(self, key, mu):
        return jax.random.poisson(key, jnp.exp(mu))

    def vi_surrogate(self, y0, offd, m, var):
        """Exact-ELBO CVI surrogate (tame.inference.poisson_cavi):
        ``E_q[exp(m)] = exp(m + v/2)`` is closed form, so the objective
        is the true ELBO and ``w = E_q[exp(m)]`` the exact curvature."""
        w = jnp.exp(jnp.clip(m + 0.5 * var, -20.0, 20.0)) * offd
        logyfac = jax.lax.lgamma(y0 + 1.0)
        loglik = jnp.sum(offd * (y0 * m - logyfac) - w)
        s = (y0 - w + w * m) * offd
        return loglik, w, s


class BernoulliDyadic(_IndependentDirections):
    """Binary ties: ``y_ij ~ Bernoulli(sigmoid(mu_ij))`` (logit link)."""

    name = "bernoulli"

    def _entry_log_prob(self, y, mu):
        return y * mu - jax.nn.softplus(mu)

    def _entry_sample(self, key, mu):
        return jax.random.bernoulli(key, jax.nn.sigmoid(mu))

    def vi_surrogate(self, y0, offd, m, var):
        """Jaakkola-Jordan bound surrogate
        (tame.inference.binary_cavi): per-dyad quadratic lower bound,
        xi-optimal in closed form (``xi^2 = E_q[m^2]``)."""
        Em2 = m * m + var
        xi = jnp.sqrt(jnp.maximum(Em2, 1e-12))
        safe = jnp.maximum(jnp.abs(xi), 1e-6)
        lam = jnp.tanh(safe / 2.0) / (4.0 * safe) * offd
        resid = (y0 - 0.5) * offd
        loglik = jnp.sum(offd * (resid * m - lam * Em2 + xi / 2.0
                                 - jax.nn.softplus(xi) + lam * xi * xi))
        return loglik, 2.0 * lam, resid


class NegativeBinomialDyadic(_IndependentDirections):
    """Overdispersed count dyads: ``y_ij ~ NegBin(mean exp(mu_ij),
    dispersion k)`` (log link; variance ``mean + mean^2 / k`` — the
    workhorse for real network counts, whose variance routinely exceeds
    the Poisson's).  Needs the dispersion at construction:
    ``NegativeBinomialDyadic(10.0)`` (smaller k = more overdispersed;
    k -> inf recovers Poisson), so it is exposed as a class rather than
    a registry name — pass the INSTANCE as ``family=``.

    The VI surrogate rides the Jaakkola-Jordan machinery: with
    ``z = m - log k`` the log-likelihood is a scaled logistic,

        log p = y m - (y + k) log k - (y + k) softplus(z) + lgamma terms,

    so the JJ bound ``-softplus(z) >= -z/2 - lam(xi) z^2 + kappa(xi)``
    with per-dyad weight ``(y + k)`` gives the quadratic surrogate
    ``w = 2 (y + k) lam(xi)``, ``s = y - (y + k)/2 + w log k``, xi
    optimal at ``xi^2 = E_q[z^2]`` — a valid ELBO lower bound, like the
    Bernoulli engine's.
    """

    def __init__(self, dispersion: float):
        self.dispersion = float(dispersion)
        if self.dispersion <= 0:
            raise ValueError("dispersion must be > 0")

    @property
    def name(self):
        return f"negbin(k={self.dispersion:g})"

    def _entry_log_prob(self, y, mu):
        k = self.dispersion
        z = mu - jnp.log(k)
        return (y * mu - (y + k) * jnp.log(k)
                - (y + k) * jax.nn.softplus(z)
                + jax.lax.lgamma(y + k) - jax.lax.lgamma(k)
                - jax.lax.lgamma(y + 1.0))

    def _entry_sample(self, key, mu):
        # Poisson-Gamma mixture: rate ~ Gamma(k, scale=exp(mu)/k)
        k = self.dispersion
        kg, kp = jax.random.split(key)
        g = jax.random.gamma(kg, k, mu.shape) * jnp.exp(mu) / k
        return jax.random.poisson(kp, g)

    def vi_surrogate(self, y0, offd, m, var):
        k = self.dispersion
        c = jnp.log(k)
        z = m - c
        Ez2 = z * z + var
        xi = jnp.sqrt(jnp.maximum(Ez2, 1e-12))
        safe = jnp.maximum(jnp.abs(xi), 1e-6)
        lam = jnp.tanh(safe / 2.0) / (4.0 * safe)
        yk = (y0 + k) * offd
        # bound value at the xi-optimal point (the lam Ez2 and lam xi^2
        # terms cancel, cf. the Bernoulli engine)
        loglik = jnp.sum(
            offd * (y0 * m - yk * c - yk * (0.5 * z - 0.5 * xi
                                            + jax.nn.softplus(xi))
                    + jax.lax.lgamma(y0 + k) - jax.lax.lgamma(
                        jnp.asarray(k))
                    - jax.lax.lgamma(y0 + 1.0)))
        w = 2.0 * yk * lam * offd
        s = (y0 - 0.5 * (y0 + k)) * offd + w * c
        return loglik, w, s

    def warm_transform(self, Y):
        return jnp.log(Y + 0.5)

    # static jit argument: hash by configuration
    def __hash__(self):
        return hash(("negbin", self.dispersion))

    def __eq__(self, other):
        return (isinstance(other, NegativeBinomialDyadic)
                and other.dispersion == self.dispersion)


_REGISTRY = {
    "gaussian": GaussianDyadic,
    "poisson": PoissonDyadic,
    "bernoulli": BernoulliDyadic,
}

FamilyLike = Union[str, GaussianDyadic, _IndependentDirections]


def get_family(family: FamilyLike):
    """Resolve a family name or instance.  Custom families are any object
    with the ``log_prob``/``sample`` surface above."""
    if isinstance(family, str):
        try:
            return _REGISTRY[family]()
        except KeyError:
            raise ValueError(
                f"unknown likelihood family {family!r}; built-ins: "
                f"{sorted(_REGISTRY)}") from None
    if hasattr(family, "log_prob"):
        return family
    raise TypeError(f"not a likelihood family: {family!r}")
