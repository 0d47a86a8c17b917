"""Model parameter construction for the (temporal) AME family.

Pure functions building the covariance/dynamics matrices of the model from a
:class:`tame.config.ModelConfig`.  Functional equivalents of the reference's
constructor-side state (reference ``src/models/base.py:123-196``,
``static_ame.py:111-127``, ``temporal_ame.py:129-145``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from tame.config import ModelConfig


class AMEParams(NamedTuple):
    """Immutable bundle of all fixed model matrices.

    Attributes
    ----------
    Sigma : (2, 2)    additive-effects prior covariance.
    Psi   : (2r, 2r)  multiplicative-effects prior covariance (block-diag).
    R     : (2, 2)    dyadic observation covariance.
    R_inv : (2, 2)    its inverse.
    Phi   : (d, d)    AR(1) transition matrix (phi * I).
    Q     : (d, d)    process-noise covariance.
    Sigma0: (d, d)    initial-state covariance blockdiag(Sigma, Psi).
    """

    Sigma: Array
    Psi: Array
    R: Array
    R_inv: Array
    Phi: Array
    Q: Array
    Sigma0: Array

    @property
    def d(self) -> int:
        return self.Phi.shape[0]

    @property
    def r(self) -> int:
        return (self.Phi.shape[0] - 2) // 2


def correlation_matrix(dim: int, correlation: float, variance: float = 1.0,
                       dtype=jnp.float32) -> Array:
    """Equicorrelation covariance: ``variance`` on the diagonal,
    ``correlation * variance`` off it (reference ``base.py:123-153``)."""
    off = correlation * variance
    m = jnp.full((dim, dim), off, dtype=dtype)
    return m.at[jnp.diag_indices(dim)].set(variance)


def block_diagonal(blocks: list[Array]) -> Array:
    """Assemble a block-diagonal matrix (reference ``base.py:155-196``)."""
    total = sum(b.shape[0] for b in blocks)
    out = jnp.zeros((total, total), dtype=blocks[0].dtype)
    start = 0
    for b in blocks:
        k = b.shape[0]
        out = out.at[start:start + k, start:start + k].set(b)
        start += k
    return out


def build_params(cfg: ModelConfig, dtype=jnp.float32) -> AMEParams:
    """Construct all model matrices from a config.

    Semantics match the reference exactly:
      * ``R`` uses variance 0.1 and correlation ``rho_dyadic``
        (``static_ame.py:96-101``);
      * ``Sigma`` is 2x2 equicorrelation with ``rho_additive``
        (``static_ame.py:113-118``);
      * ``Psi`` is blockdiag of two r x r equicorrelation blocks with
        ``rho_multiplicative`` (``static_ame.py:120-127``);
      * ``Phi = ar * I_d`` and
        ``Q = (1 - ar^2) * blockdiag(Sigma, Psi) * process_noise_scale``
        (``temporal_ame.py:131-145``) — note the deliberate non-stationary
        shrinkage when ``process_noise_scale != 1``;
      * the initial state covariance is the *unscaled* blockdiag
        (``temporal_ame.py:176-182``).
    """
    r = cfg.latent_dim
    Sigma = correlation_matrix(2, cfg.rho_additive, 1.0, dtype)
    psi_block = correlation_matrix(r, cfg.rho_multiplicative, 1.0, dtype)
    Psi = block_diagonal([psi_block, psi_block])
    R = correlation_matrix(2, cfg.rho_dyadic, cfg.dyadic_variance, dtype)
    R_inv = jnp.linalg.inv(R)

    d = cfg.d
    Sigma0 = block_diagonal([Sigma, Psi])
    Phi = jnp.eye(d, dtype=dtype) * cfg.ar_coefficient
    Q = (1.0 - cfg.ar_coefficient ** 2) * Sigma0 * cfg.process_noise_scale
    return AMEParams(Sigma=Sigma, Psi=Psi, R=R, R_inv=R_inv, Phi=Phi, Q=Q,
                     Sigma0=Sigma0)
