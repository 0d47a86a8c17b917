"""Static (single-snapshot) AME model.

Reference: ``/root/reference/src/models/static_ame.py`` (Hoff 2021 family).
The static model is the T=1 member of the family; sampling is one batched
draw of (A, M) through the prior Cholesky factors plus one symmetrized dyad
sample — no per-node or per-dyad Python loops (contrast reference
``static_ame.py:155-187``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from tame.config import ModelConfig
from tame.models.base import BaseAMEModel
from tame.models.params import AMEParams, build_params
from tame.ops import dyad as dyad_ops


def sample_static(params: AMEParams, key: Array, n: int
                  ) -> Tuple[Array, Array, Array]:
    """Sample (Y, A, M) from the static AME model.

    Returns
    -------
    Y : (n, n, 2), A : (n, 2), M : (n, 2r)
    """
    r = params.r
    ka, km, ky = jax.random.split(key, 3)
    LA = jnp.linalg.cholesky(params.Sigma)
    LM = jnp.linalg.cholesky(params.Psi)
    LR = jnp.linalg.cholesky(params.R)
    A = jax.random.normal(ka, (n, 2)) @ LA.T
    M = jax.random.normal(km, (n, 2 * r)) @ LM.T
    mu = dyad_ops.dyadic_mean_static(A, M, r)
    noise = jax.random.normal(ky, (n, n, 2)) @ LR.T
    Y = dyad_ops.symmetrize_dyads(mu + noise)
    return Y, A, M


class StaticAMEModel(BaseAMEModel):
    """Static AME model (reference class surface, ``static_ame.py:30-325``)."""

    def __init__(
        self,
        n_nodes: int,
        latent_dim: int = 2,
        rho_additive: float = 0.5,
        rho_multiplicative: float = 0.3,
        rho_dyadic: float = 0.5,
        seed: int = 42,
    ):
        self.config = ModelConfig(
            n_nodes=n_nodes,
            n_time=1,
            latent_dim=latent_dim,
            rho_additive=rho_additive,
            rho_multiplicative=rho_multiplicative,
            rho_dyadic=rho_dyadic,
            seed=seed,
        )
        self.params = build_params(self.config)
        self.n = n_nodes
        self.r = latent_dim
        self.rho_additive = rho_additive
        self.rho_multiplicative = rho_multiplicative
        self.rho_dyadic = rho_dyadic
        self.seed = seed
        self._key = jax.random.PRNGKey(seed)

        self.A: Optional[Array] = None
        self.M: Optional[Array] = None
        self.Y: Optional[Array] = None

    @property
    def Sigma(self) -> Array:
        return self.params.Sigma

    @property
    def Psi(self) -> Array:
        return self.params.Psi

    @property
    def R(self) -> Array:
        return self.params.R

    @property
    def R_inv(self) -> Array:
        return self.params.R_inv

    def generate_data(self, return_latents: bool = False, key=None):
        """Sample a network (reference ``static_ame.py:129-187``)."""
        if key is None:
            self._key, key = jax.random.split(self._key)
        Y, A, M = sample_static(self.params, key, self.n)
        Y = jax.block_until_ready(Y)
        self.Y, self.A, self.M = Y, A, M
        if return_latents:
            return Y, A, M
        return Y

    def compute_mean(self, A: Array, M: Array) -> Array:
        """Mean structure (reference ``static_ame.py:189-238``)."""
        return dyad_ops.dyadic_mean_static(jnp.asarray(A), jnp.asarray(M),
                                           self.r)

    def compute_reconstruction_error(self, A_est: Array, M_est: Array) -> float:
        """Off-diagonal MSE at estimated parameters (reference
        ``static_ame.py:240-275``; per-dyad normalization n(n-1))."""
        if self.Y is None:
            raise ValueError("No data generated yet. Call generate_data() first.")
        mu = self.compute_mean(A_est, M_est)
        return float(dyad_ops.masked_sq_error_static(self.Y, mu))

    def compute_additive_contribution(self, A: Array) -> float:
        return float(dyad_ops.additive_contribution(jnp.asarray(A)))

    def compute_multiplicative_contribution(self, M: Array) -> float:
        return float(dyad_ops.multiplicative_contribution(jnp.asarray(M)))
