"""Variational-EM hyperparameter learning (tame/inference/em.py).

The reference never estimates hyperparameters (its engines take them from
the model object as known constants); these tests pin the capability:
recovery of the generating phi / sigma^2 / rho / Q / Sigma0 from a wrong
starting guess, the Monte-Carlo-exactness of the posterior-moment
corrections in the R M-step, and the masked variant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tame.config import ModelConfig
from tame.inference import em_update_params, fit_em
from tame.models import build_params, sample


@pytest.mark.slow
class TestEMRecovery:
    @pytest.fixture(scope="class")
    def em_run(self):
        cfg = ModelConfig(n_nodes=20, n_time=20, latent_dim=1, seed=3,
                          ar_coefficient=0.8, rho_dyadic=0.5)
        Y, _ = sample(build_params(cfg), jax.random.PRNGKey(3), 20, 20)
        # badly wrong start: phi 0.3 (true 0.8), sigma2 1.0 (true 0.1),
        # rho 0 (true 0.5)
        cfg0 = ModelConfig(n_nodes=20, n_time=20, latent_dim=1, seed=3,
                           ar_coefficient=0.3, rho_dyadic=0.0,
                           dyadic_variance=1.0)
        return fit_em(Y, build_params(cfg0), n_em=25, em_tolerance=5e-4)

    def test_recovers_dynamics(self, em_run):
        h = em_run.history
        assert abs(h["phi"][-1] - 0.8) < 0.05
        assert abs(h["trQ"][-1] - 0.144) / 0.144 < 0.25

    def test_recovers_observation_noise(self, em_run):
        h = em_run.history
        assert abs(h["sigma2"][-1] - 0.1) / 0.1 < 0.15
        assert abs(h["rho"][-1] - 0.5) < 0.07

    def test_recovers_initial_scale(self, em_run):
        # Sigma0 absorbs leftover slack from the wrong start; the scale
        # must land near the generating trace 4.0
        assert abs(em_run.history["trSigma0"][-1] - 4.0) < 1.0

    def test_monotone_improvement_and_convergence(self, em_run):
        e = em_run.history["elbo"]
        assert len(e) < 25  # the em_tolerance stopping rule fired
        assert e[-1] > e[0] + 100  # massive improvement from wrong start
        # learned params are a valid AMEParams: R SPD, Q SPD
        assert np.all(np.linalg.eigvalsh(
            np.asarray(em_run.params.R)) > 0)
        assert np.all(np.linalg.eigvalsh(
            np.asarray(em_run.params.Q)) > 0)

    def test_invalid_learnable_rejected(self, em_run):
        with pytest.raises(ValueError, match="unknown learnable"):
            em_update_params(em_run.params, jnp.zeros((4, 4, 2, 2)),
                             em_run.state, learn=("phi", "bogus"))


class TestResidualMomentCorrections:
    def test_matches_monte_carlo(self):
        """The exact E_q second-moment corrections (incl. the bilinear
        tr(S_i S_j) terms the delta method drops) vs sampling the
        posteriors."""
        from tame.inference.em import _residual_moment_corrections
        from tame.inference.smoothed import SmoothedState

        rng = np.random.default_rng(0)
        n, T, r = 5, 3, 2
        d = 2 + 2 * r
        mu = rng.normal(size=(n, T, d)).astype(np.float32)
        A = rng.normal(size=(n, T, d, d)) * 0.3
        S = (np.einsum("ntij,ntkj->ntik", A, A)
             + 0.05 * np.eye(d)).astype(np.float32)
        chol = np.linalg.cholesky(S)
        Ss = 100000
        x = mu[None] + np.einsum(
            "ntij,sntj->snti", chol,
            rng.standard_normal((Ss, n, T, d)).astype(np.float32))
        a, b = x[..., 0], x[..., 1]
        U, V = x[..., 2:2 + r], x[..., 2 + r:]
        mu_d = (a[:, :, None] + b[:, None, :]
                + np.einsum("sitr,sjtr->sijt", U, V))
        m = np.broadcast_to((1.0 - np.eye(n))[:, :, None], (n, n, T))
        var_mc = (mu_d.var(axis=0) * m).sum()
        c = mu_d - mu_d.mean(0)
        cross_mc = ((c * np.swapaxes(c, 1, 2)).mean(0) * m).sum()
        st = SmoothedState(X_mean=jnp.asarray(mu), X_cov=jnp.asarray(S),
                           X_cross=jnp.zeros((n, T - 1, d, d)),
                           logdets=jnp.zeros(()))
        va, ca = _residual_moment_corrections(
            st, jnp.asarray(m, jnp.float32))
        assert abs(float(va) - var_mc) / var_mc < 0.02
        assert abs(float(ca) - cross_mc) / abs(cross_mc) < 0.05


class TestMaskedEM:
    @pytest.mark.slow
    def test_masked_em_recovers_noise(self):
        """EM on 70% of dyads still recovers the observation noise."""
        from tame.models import random_dyad_mask

        cfg = ModelConfig(n_nodes=16, n_time=12, latent_dim=1, seed=5,
                          ar_coefficient=0.8, rho_dyadic=0.5)
        Y, _ = sample(build_params(cfg), jax.random.PRNGKey(5), 16, 12)
        mask = random_dyad_mask(jax.random.PRNGKey(9), 16, 12, 0.3)
        cfg0 = ModelConfig(n_nodes=16, n_time=12, latent_dim=1, seed=5,
                           ar_coefficient=0.4, rho_dyadic=0.0,
                           dyadic_variance=0.5)
        res = fit_em(Y, build_params(cfg0), n_em=15, mask=mask)
        h = res.history
        assert abs(h["sigma2"][-1] - 0.1) / 0.1 < 0.3
        assert abs(h["phi"][-1] - 0.8) < 0.12
        assert np.isfinite(h["elbo"]).all()


@pytest.mark.slow
class TestGeneralizedPhi:
    """EM beyond the parity parameterization: dimension-grouped AR rates
    (phi_structure='blocks'/'diag') with closed-form M-steps, and the
    reciprocity-free R variant.  The reference fixes all hyperparameters
    (src/inference/base.py:84-125) and its model only expresses
    Phi = phi I (temporal_ame.py:131-132)."""

    def test_recovers_two_rate_phi(self):
        from tame.config import ModelConfig
        from tame.models import build_params, sample

        cfg = ModelConfig(n_nodes=32, n_time=12, latent_dim=1, seed=0)
        p = build_params(cfg)
        # truth: additive effects persist (0.9), positions mix fast (0.4)
        phis = jnp.asarray([0.9, 0.9, 0.4, 0.4])
        Qbase = p.Q / (1 - 0.8 ** 2)
        s = jnp.diag(jnp.sqrt(1 - phis ** 2))
        Q = s @ Qbase @ s
        pt = p._replace(Phi=jnp.diag(phis), Q=0.5 * (Q + Q.T))
        Y, _ = sample(pt, jax.random.PRNGKey(0), 32, 12)

        cfg0 = ModelConfig(n_nodes=32, n_time=12, latent_dim=1,
                           ar_coefficient=0.6, seed=0)
        res = fit_em(Y, build_params(cfg0), n_em=8,
                     phi_structure="blocks")
        h = res.history
        assert abs(h["phi"][-1] - 0.9) < 0.1, h["phi"][-1]
        assert abs(h["phi_mult"][-1] - 0.4) < 0.15, h["phi_mult"][-1]
        # the two learned rates are genuinely distinct
        assert h["phi"][-1] - h["phi_mult"][-1] > 0.3

    def test_scalar_structure_matches_legacy(self):
        """phi_structure='scalar' (one group) must reduce to the original
        tr(Q^-1 A)/tr(Q^-1 B) maximizer."""
        from tame.config import ModelConfig
        from tame.inference.em import em_update_params
        from tame.inference.smoothed import (
            fit_cavi_smoothed,
            warm_init_smoothed_state,
        )
        from tame.models import build_params, sample

        cfg = ModelConfig(n_nodes=12, n_time=6, latent_dim=1, seed=1)
        p = build_params(cfg)
        Y, _ = sample(p, jax.random.PRNGKey(1), 12, 6)
        st = warm_init_smoothed_state(Y, p)
        out = fit_cavi_smoothed(Y, p, st, max_iter=30, tolerance=0.0)
        upd = em_update_params(p, Y, out.state,
                               phi_structure="scalar")
        # closed form computed directly
        from tame.inference.em import _transition_moments
        A, B, _, _ = _transition_moments(out.state)
        Q_inv = jnp.linalg.inv(p.Q)
        phi_direct = float(jnp.trace(Q_inv @ A) / jnp.trace(Q_inv @ B))
        assert abs(float(upd.Phi[0, 0]) - phi_direct) < 1e-5
        # Phi stays a multiple of I
        off = np.asarray(upd.Phi - jnp.diag(jnp.diagonal(upd.Phi)))
        assert np.allclose(off, 0.0)
        assert np.allclose(np.diagonal(np.asarray(upd.Phi)),
                           float(upd.Phi[0, 0]))

    def test_diag_r_structure(self):
        """r_structure='diag' pins the reciprocity correlation at zero
        while still learning the variance."""
        from tame.config import ModelConfig
        from tame.inference.em import em_update_params
        from tame.inference.smoothed import (
            fit_cavi_smoothed,
            warm_init_smoothed_state,
        )
        from tame.models import build_params, sample

        cfg = ModelConfig(n_nodes=12, n_time=6, latent_dim=1, seed=2)
        p = build_params(cfg)
        Y, _ = sample(p, jax.random.PRNGKey(2), 12, 6)
        st = warm_init_smoothed_state(Y, p)
        out = fit_cavi_smoothed(Y, p, st, max_iter=30, tolerance=0.0)
        upd = em_update_params(p, Y, out.state, r_structure="diag")
        assert float(upd.R[0, 1]) == 0.0
        assert float(upd.R[0, 0]) > 0.0

    def test_unknown_structures_raise(self):
        from tame.inference.em import _phi_groups, em_update_params

        with pytest.raises(ValueError, match="phi_structure"):
            _phi_groups("banana", 4)


@pytest.mark.slow
class TestNonGaussianEM:
    """EM through the non-Gaussian smoothed E-steps
    (tame/inference/family_smoothed.py): the phi/Q/Sigma0 M-steps are
    likelihood-agnostic reductions of the joint-trajectory posterior
    moments, so hyperparameter learning must work for binary and count
    networks too (the reference supports neither non-Gaussian data nor
    hyperparameter estimation)."""

    def _run(self, family, n=200, T=12, mask=None, **kw):
        cfg = ModelConfig(n_nodes=n, n_time=T, latent_dim=1,
                          ar_coefficient=0.8, seed=3)
        p_true = build_params(cfg)
        Y, X = sample(p_true, jax.random.PRNGKey(3), n, T, family=family)
        if mask is not None:
            Y = jnp.where(mask[..., None] == 0, jnp.nan, Y)
        cfg0 = ModelConfig(n_nodes=n, n_time=T, latent_dim=1,
                           ar_coefficient=0.3, seed=3)
        kw.setdefault("n_em", 10)
        return fit_em(Y, build_params(cfg0), family=family,
                      inner_max_iter=100, learning_rate=0.7,
                      mask=mask, verbose=False, **kw)

    def test_binary_recovers_phi(self):
        out = self._run("bernoulli")
        assert abs(out.history["phi"][-1] - 0.8) < 0.05, \
            out.history["phi"]
        # the JJ objective improves monotonically across EM iterations
        eh = np.asarray(out.history["elbo"])
        assert np.all(np.diff(eh) > -abs(eh[0]) * 1e-3)

    def test_poisson_recovers_phi(self):
        out = self._run("poisson")
        assert abs(out.history["phi"][-1] - 0.8) < 0.05, \
            out.history["phi"]

    def test_binary_masked_recovers_phi(self):
        from tame.models import random_dyad_mask

        mask = random_dyad_mask(jax.random.PRNGKey(9), 200, 12, 0.3)
        out = self._run("bernoulli", mask=mask)
        assert abs(out.history["phi"][-1] - 0.8) < 0.07, \
            out.history["phi"]

    def test_r_dropped_from_learnables(self):
        """sigma2/rho must stay at their starting values: the R M-step is
        Gaussian-specific and auto-dropped for non-Gaussian families."""
        out = self._run("bernoulli", n=40, T=6, n_em=3)
        assert out.history["sigma2"][0] == out.history["sigma2"][-1]
        assert out.history["rho"][0] == out.history["rho"][-1]

    def test_unknown_family_raises(self):
        cfg = ModelConfig(n_nodes=8, n_time=3, latent_dim=1, seed=0)
        p = build_params(cfg)
        Y, _ = sample(p, jax.random.PRNGKey(0), 8, 3)
        with pytest.raises(ValueError, match="family"):
            fit_em(Y, p, family="banana")


class TestSmoothedFamilyEstep:
    """The smoothed non-Gaussian fits themselves (guarded loop, warm
    start, masked gating) at unit-test scale."""

    def test_converges_and_recovers_predictor(self):
        from tame.inference import (
            fit_smoothed_family,
            warm_init_smoothed_family,
        )
        from tame.ops import dyad as dyad_ops

        for fam in ("bernoulli", "poisson"):
            cfg = ModelConfig(n_nodes=24, n_time=6, latent_dim=1, seed=0)
            p = build_params(cfg)
            Y, X = sample(p, jax.random.PRNGKey(0), 24, 6, family=fam)
            init = warm_init_smoothed_family(Y, p, fam)
            out = fit_smoothed_family(Y, p, init, family=fam,
                                      max_iter=200, learning_rate=0.7,
                                      tolerance=1e-6)
            assert bool(out.converged) and not bool(out.diverged)
            m_true = np.asarray(dyad_ops.dyadic_fwd_temporal(
                jnp.asarray(X), 1))
            m_est = np.asarray(dyad_ops.dyadic_fwd_temporal(
                out.state.X_mean, 1))
            off = ~np.eye(24, dtype=bool)
            corr = np.corrcoef(m_true[off].ravel(),
                               m_est[off].ravel())[0, 1]
            assert corr > 0.8, (fam, corr)
            # the trajectory posterior carries genuine lag-1 couplings
            assert float(jnp.abs(out.state.X_cross).max()) > 1e-4

    def test_masked_entries_never_read(self):
        from tame.inference import (
            fit_smoothed_family,
            warm_init_smoothed_family,
        )
        from tame.models import random_dyad_mask

        cfg = ModelConfig(n_nodes=14, n_time=4, latent_dim=1, seed=2)
        p = build_params(cfg)
        Y, _ = sample(p, jax.random.PRNGKey(2), 14, 4, family="poisson")
        mask = random_dyad_mask(jax.random.PRNGKey(5), 14, 4, 0.3)
        Yg = jnp.where(mask[..., None] == 0, jnp.nan, Y)
        init = warm_init_smoothed_family(Y, p, "poisson", obs_mask=mask)
        kw = dict(family="poisson", max_iter=30, learning_rate=0.7,
                  tolerance=0.0, mask=mask)
        a = fit_smoothed_family(Y, p, init, **kw)
        b = fit_smoothed_family(Yg, p, init, **kw)
        assert np.array_equal(np.asarray(a.state.X_mean),
                              np.asarray(b.state.X_mean))

    def test_unknown_family_raises(self):
        from tame.inference import fit_smoothed_family
        from tame.inference.smoothed import init_smoothed_state

        cfg = ModelConfig(n_nodes=6, n_time=2, latent_dim=1, seed=0)
        p = build_params(cfg)
        Y, _ = sample(p, jax.random.PRNGKey(0), 6, 2)
        st = init_smoothed_state(jax.random.PRNGKey(0), 6, 2, 4)
        with pytest.raises(ValueError, match="family"):
            fit_smoothed_family(Y, p, st, family="banana")


class TestCustomFamilyVI:
    """The vi_surrogate protocol (tame.models.likelihoods): a USER
    likelihood — Poisson with a known exposure, ~25 lines — gets
    trajectory-smoothed VI and dynamics EM with no engine changes.
    This is the 'model DSL reaches the fit layer' guarantee."""

    class ExposurePoisson:
        """y ~ Poisson(E exp(m)) with known exposure E."""

        name = "exposure_poisson"

        def __init__(self, exposure):
            self.exposure = float(exposure)

        def sample(self, key, params, mu):
            n = mu.shape[0]
            rate = self.exposure * jnp.exp(mu[..., 0])
            Yf = jax.random.poisson(key, rate).astype(mu.dtype)
            Yf = Yf * (1.0 - jnp.eye(n))[:, :, None]
            return jnp.stack([Yf, jnp.swapaxes(Yf, 0, 1)], axis=-1)

        def vi_surrogate(self, y0, offd, m, var):
            logE = jnp.log(self.exposure)
            w = self.exposure * jnp.exp(
                jnp.clip(m + 0.5 * var, -20.0, 20.0)) * offd
            loglik = jnp.sum(offd * (y0 * (m + logE)
                                     - jax.lax.lgamma(y0 + 1.0)) - w)
            s = (y0 - w + w * m) * offd
            return loglik, w, s

        def warm_transform(self, Y):
            return jnp.log(Y + 0.5) - jnp.log(self.exposure)

        # static jit argument: hash by configuration
        def __hash__(self):
            return hash(("exposure_poisson", self.exposure))

        def __eq__(self, other):
            return (isinstance(other, type(self))
                    and other.exposure == self.exposure)

    def _data(self, n=30, T=8, seed=3):
        from tame.models.temporal_ame import sample_latents
        from tame.ops import dyad as dyad_ops

        cfg = ModelConfig(n_nodes=n, n_time=T, latent_dim=1,
                          ar_coefficient=0.8, seed=seed)
        p = build_params(cfg)
        fam = self.ExposurePoisson(6.0)
        X = sample_latents(p, jax.random.PRNGKey(seed), n, T)
        mu = dyad_ops.dyadic_mean_temporal(X, 1)
        Y = fam.sample(jax.random.PRNGKey(seed + 1), p, mu)
        return p, fam, Y, X

    def test_custom_family_vi_recovers_predictor(self):
        from tame.inference import (
            fit_smoothed_family,
            warm_init_smoothed_family,
        )
        from tame.ops import dyad as dyad_ops

        p, fam, Y, X = self._data()
        init = warm_init_smoothed_family(Y, p, fam)
        out = fit_smoothed_family(Y, p, init, family=fam, max_iter=300,
                                  learning_rate=0.7, tolerance=1e-5)
        assert not bool(out.diverged)
        m_true = np.asarray(dyad_ops.dyadic_fwd_temporal(
            jnp.asarray(X), 1))
        m_est = np.asarray(dyad_ops.dyadic_fwd_temporal(
            out.state.X_mean, 1))
        off = ~np.eye(30, dtype=bool)
        corr = np.corrcoef(m_true[off].ravel(), m_est[off].ravel())[0, 1]
        assert corr > 0.95, corr

    @pytest.mark.slow
    def test_custom_family_em_recovers_phi(self):
        p, fam, Y, X = self._data()
        cfg0 = ModelConfig(n_nodes=30, n_time=8, latent_dim=1,
                           ar_coefficient=0.3, seed=3)
        res = fit_em(Y, build_params(cfg0), family=fam, n_em=8,
                     inner_max_iter=100, learning_rate=0.7,
                     verbose=False)
        assert abs(res.history["phi"][-1] - 0.8) < 0.1, \
            res.history["phi"]

    def test_family_without_surrogate_rejected(self):
        from tame.inference import fit_smoothed_family
        from tame.inference.smoothed import init_smoothed_state

        class NoSurrogate:
            pass

        cfg = ModelConfig(n_nodes=6, n_time=2, latent_dim=1, seed=0)
        p = build_params(cfg)
        Y, _ = sample(p, jax.random.PRNGKey(0), 6, 2)
        st = init_smoothed_state(jax.random.PRNGKey(0), 6, 2, 4)
        with pytest.raises(ValueError, match="vi_surrogate"):
            fit_smoothed_family(Y, p, st, family=NoSurrogate())
        with pytest.raises(ValueError, match="vi_surrogate"):
            fit_em(Y, p, family=NoSurrogate(), n_em=1)


class TestNegativeBinomialFamily:
    """Built-in overdispersed-count family
    (tame.models.likelihoods.NegativeBinomialDyadic): the JJ bound with
    data-dependent weights (y + k) gives it VI + EM through the
    vi_surrogate protocol; sampling is the Poisson-Gamma mixture."""

    def _data(self, k=5.0, n=30, T=8, seed=3):
        from tame.models import NegativeBinomialDyadic
        from tame.models.temporal_ame import sample_latents
        from tame.ops import dyad as dyad_ops

        cfg = ModelConfig(n_nodes=n, n_time=T, latent_dim=1,
                          ar_coefficient=0.8, seed=seed)
        p = build_params(cfg)
        fam = NegativeBinomialDyadic(k)
        X = sample_latents(p, jax.random.PRNGKey(seed), n, T)
        mu = dyad_ops.dyadic_mean_temporal(X, 1)
        Y = fam.sample(jax.random.PRNGKey(seed + 1), p, mu)
        return p, fam, Y, X

    def test_samples_are_overdispersed(self):
        p, fam, Y, X = self._data()
        y0 = np.asarray(Y[..., 0])
        # NB variance = mean + mean^2/k far exceeds the Poisson's
        assert y0.var() > 5.0 * y0.mean()

    def test_log_prob_prefers_truth(self):
        from tame.inference.logprob import make_logdensity_fn

        p, fam, Y, X = self._data()
        fn = make_logdensity_fn(p, Y, family=fam)
        noise = 0.1 * jax.random.normal(jax.random.PRNGKey(9), X.shape)
        assert float(fn(jnp.asarray(X))) > float(fn(noise))

    def test_vi_recovers_predictor(self):
        from tame.inference import (
            fit_smoothed_family,
            warm_init_smoothed_family,
        )
        from tame.ops import dyad as dyad_ops

        p, fam, Y, X = self._data()
        init = warm_init_smoothed_family(Y, p, fam)
        out = fit_smoothed_family(Y, p, init, family=fam, max_iter=300,
                                  learning_rate=0.7, tolerance=1e-5)
        assert not bool(out.diverged)
        m_true = np.asarray(dyad_ops.dyadic_fwd_temporal(
            jnp.asarray(X), 1))
        m_est = np.asarray(dyad_ops.dyadic_fwd_temporal(
            out.state.X_mean, 1))
        off = ~np.eye(30, dtype=bool)
        corr = np.corrcoef(m_true[off].ravel(), m_est[off].ravel())[0, 1]
        assert corr > 0.9, corr

    @pytest.mark.slow
    def test_em_recovers_phi(self):
        p, fam, Y, X = self._data()
        cfg0 = ModelConfig(n_nodes=30, n_time=8, latent_dim=1,
                           ar_coefficient=0.3, seed=3)
        res = fit_em(Y, build_params(cfg0), family=fam, n_em=8,
                     inner_max_iter=100, learning_rate=0.7,
                     verbose=False)
        assert abs(res.history["phi"][-1] - 0.8) < 0.1, \
            res.history["phi"]

    def test_invalid_dispersion_rejected(self):
        from tame.models import NegativeBinomialDyadic

        with pytest.raises(ValueError, match="dispersion"):
            NegativeBinomialDyadic(-1.0)


@pytest.mark.slow
def test_negbin_vi_matches_nuts_posterior():
    """Gold-standard check for the third family: the smoothed NB
    variational predictor must agree with the NUTS posterior mean of
    the SAME negative-binomial target (measured 0.999 correlation)."""
    from tame.inference import (
        fit_smoothed_family,
        warm_init_smoothed_family,
    )
    from tame.inference.logprob import make_logdensity_fn
    from tame.inference.nuts import run_nuts
    from tame.models import NegativeBinomialDyadic
    from tame.models.temporal_ame import sample_latents
    from tame.ops import dyad as dyad_ops

    n, T, r = 14, 4, 1
    p = build_params(ModelConfig(n_nodes=n, n_time=T, latent_dim=r,
                                 seed=2))
    fam = NegativeBinomialDyadic(5.0)
    X = sample_latents(p, jax.random.PRNGKey(2), n, T)
    Y = fam.sample(jax.random.PRNGKey(3), p,
                   dyad_ops.dyadic_mean_temporal(X, r))
    init = warm_init_smoothed_family(Y, p, fam)
    vi = fit_smoothed_family(Y, p, init, family=fam, max_iter=300,
                             learning_rate=0.7, tolerance=1e-5)
    m_vi = np.asarray(dyad_ops.dyadic_fwd_temporal(vi.state.X_mean, r))
    fn = make_logdensity_fn(p, Y, family=fam)
    out = jax.vmap(lambda pos, k: run_nuts(
        fn, pos, k, num_warmup=200, num_samples=200, max_depth=6))(
        0.1 * jax.random.normal(jax.random.PRNGKey(4), (2,) + X.shape),
        jax.random.split(jax.random.PRNGKey(5), 2))
    samples = jnp.asarray(out.positions).reshape((-1,) + X.shape)
    m_nuts = np.asarray(jnp.mean(jax.vmap(
        lambda Xs: dyad_ops.dyadic_fwd_temporal(Xs, r))(samples), 0))
    off = ~np.eye(n, dtype=bool)
    corr = np.corrcoef(m_vi[off].ravel(), m_nuts[off].ravel())[0, 1]
    assert corr > 0.95, corr
