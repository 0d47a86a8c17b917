"""Model tests: shapes, invariants, reproducibility, dynamics.

Coverage model: reference ``tests/test_models.py`` — shapes, zero diagonal,
reciprocity, near-zero reconstruction error at truth, contribution
non-negativity, same-seed reproducibility, AR-dynamics residual bounds,
covariance constructors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tame.config import ModelConfig
from tame.models import StaticAMEModel, TemporalAMEModel, build_params
from tame.models.params import block_diagonal, correlation_matrix


class TestStaticAMEModel:
    def test_shapes(self, static_data):
        m = static_data["model"]
        assert static_data["Y"].shape == (m.n, m.n, 2)
        assert static_data["A"].shape == (m.n, 2)
        assert static_data["M"].shape == (m.n, 2 * m.r)

    def test_zero_diagonal(self, static_data):
        Y = np.asarray(static_data["Y"])
        assert np.allclose(np.diagonal(Y, axis1=0, axis2=1), 0.0)

    def test_reciprocity(self, static_data):
        """Y[i,j,1] == Y[j,i,0] (reference ``test_models.py:42-45``)."""
        Y = np.asarray(static_data["Y"])
        assert np.allclose(Y[..., 1], Y.transpose(1, 0, 2)[..., 0])

    def test_recon_error_at_truth_small(self, static_data):
        """At the true parameters the residual is pure dyadic noise:
        per-dyad MSE ~ 2 * 0.1."""
        m = static_data["model"]
        err = m.compute_reconstruction_error(static_data["A"],
                                             static_data["M"])
        assert 0.05 < err < 0.6

    def test_contributions_nonnegative(self, static_data):
        m = static_data["model"]
        assert m.compute_additive_contribution(static_data["A"]) >= 0
        assert m.compute_multiplicative_contribution(static_data["M"]) >= 0

    def test_same_seed_reproducible(self, small_network_params):
        m1 = StaticAMEModel(**small_network_params)
        m2 = StaticAMEModel(**small_network_params)
        Y1 = m1.generate_data()
        Y2 = m2.generate_data()
        assert np.allclose(np.asarray(Y1), np.asarray(Y2))

    def test_different_seed_differs(self, small_network_params):
        p = dict(small_network_params)
        m1 = StaticAMEModel(**p)
        p["seed"] = 7
        m2 = StaticAMEModel(**p)
        assert not np.allclose(np.asarray(m1.generate_data()),
                               np.asarray(m2.generate_data()))

    def test_mean_structure(self, static_model):
        n, r = static_model.n, static_model.r
        A = jnp.ones((n, 2))
        M = jnp.zeros((n, 2 * r))
        mu = static_model.compute_mean(A, M)
        assert np.allclose(np.asarray(mu), 2.0)  # a_i + b_j = 2 everywhere


class TestTemporalAMEModel:
    def test_shapes(self, temporal_data):
        m = temporal_data["model"]
        assert temporal_data["Y"].shape == (m.n, m.n, m.T, 2)
        assert temporal_data["X"].shape == (m.n, m.T, m.d)

    def test_reciprocity_all_times(self, temporal_data):
        Y = np.asarray(temporal_data["Y"])
        assert np.allclose(Y[..., 1], Y.transpose(1, 0, 2, 3)[..., 0])
        assert np.allclose(np.diagonal(Y, axis1=0, axis2=1), 0.0)

    def test_recon_error_at_truth(self, temporal_data):
        m = temporal_data["model"]
        err = m.compute_temporal_reconstruction_error(temporal_data["X"])
        # pure dyadic noise, per-dyad normalization ~ 2 * 0.1
        assert 0.1 < err < 0.4

    def test_ar_dynamics_residuals(self, temporal_data):
        """X_t - Phi X_{t-1} residuals should match process noise scale
        (reference ``test_models.py:206-225``)."""
        m = temporal_data["model"]
        X = np.asarray(temporal_data["X"])
        resid = X[:, 1:] - X[:, :-1] * m.ar_coefficient
        expected_var = np.diag(np.asarray(m.Q)).mean()
        assert resid.var() < 10 * expected_var
        assert resid.var() > 0.1 * expected_var

    def test_same_seed_reproducible(self, temporal_network_params):
        Y1 = TemporalAMEModel(**temporal_network_params).generate_data()
        Y2 = TemporalAMEModel(**temporal_network_params).generate_data()
        assert np.allclose(np.asarray(Y1), np.asarray(Y2))

    def test_get_states_at_time(self, temporal_data):
        m = temporal_data["model"]
        A0, M0 = m.get_states_at_time(0)
        assert A0.shape == (m.n, 2)
        assert M0.shape == (m.n, 2 * m.r)
        with pytest.raises(ValueError):
            m.get_states_at_time(m.T)

    def test_requires_generated_data(self, temporal_network_params):
        m = TemporalAMEModel(**temporal_network_params)
        with pytest.raises(ValueError):
            m.get_states_at_time(0)
        with pytest.raises(ValueError):
            m.compute_temporal_reconstruction_error(
                jnp.zeros((m.n, m.T, m.d)))

    def test_temporal_contributions_shape(self, temporal_data):
        m = temporal_data["model"]
        add = m.compute_temporal_additive_contribution(temporal_data["X"])
        mult = m.compute_temporal_multiplicative_contribution(
            temporal_data["X"])
        assert add.shape == (m.T,)
        assert mult.shape == (m.T,)
        assert np.all(np.asarray(add) >= 0)

    def test_ar_coefficient_zero_gives_iid(self):
        m = TemporalAMEModel(n_nodes=8, n_time=6, ar_coefficient=0.0,
                             process_noise_scale=1.0, seed=3)
        _, X = m.generate_data(return_latents=True)
        X = np.asarray(X)
        # lag-1 autocorrelation should be near zero
        x0 = X[:, :-1].ravel()
        x1 = X[:, 1:].ravel()
        corr = np.corrcoef(x0, x1)[0, 1]
        assert abs(corr) < 0.15


class TestCovarianceConstructors:
    def test_correlation_matrix(self):
        C = np.asarray(correlation_matrix(4, 0.3, 2.0))
        assert np.allclose(np.diag(C), 2.0)
        off = C[~np.eye(4, dtype=bool)]
        assert np.allclose(off, 0.6)

    def test_block_diagonal(self):
        A = jnp.eye(2) * 2.0
        B = jnp.ones((3, 3))
        C = np.asarray(block_diagonal([A, B]))
        assert C.shape == (5, 5)
        assert np.allclose(C[:2, :2], np.asarray(A))
        assert np.allclose(C[2:, 2:], np.asarray(B))
        assert np.allclose(C[:2, 2:], 0.0)

    def test_build_params_semantics(self):
        cfg = ModelConfig(n_nodes=5, n_time=4, latent_dim=2,
                          ar_coefficient=0.8, process_noise_scale=0.1)
        p = build_params(cfg)
        # R: variance 0.1, corr rho_dyadic (reference static_ame.py:96-101)
        assert np.allclose(np.asarray(p.R),
                           np.array([[0.1, 0.05], [0.05, 0.1]]))
        # Q = (1 - 0.64) * Sigma0 * 0.1 (reference temporal_ame.py:144-145)
        assert np.allclose(np.asarray(p.Q),
                           0.36 * 0.1 * np.asarray(p.Sigma0), atol=1e-6)
        # Sigma0 block-diagonal structure
        S0 = np.asarray(p.Sigma0)
        assert np.allclose(S0[:2, 2:], 0.0)
        assert np.allclose(S0[:2, :2], np.asarray(p.Sigma))

    def test_params_positive_definite(self):
        cfg = ModelConfig(n_nodes=5, n_time=4, latent_dim=3)
        p = build_params(cfg)
        for M in (p.Sigma, p.Psi, p.R, p.Q, p.Sigma0):
            eigs = np.linalg.eigvalsh(np.asarray(M))
            assert np.all(eigs > 0)
