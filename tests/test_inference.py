"""Inference tests: structure invariants, fit behavior, convergence,
cross-method differences.

Coverage model: reference ``tests/test_inference.py`` — init shapes and
structure invariants, fit runs and history lengths, ELBO finiteness,
structure preservation after optimization, convergence detection, learning
rate sensitivity, cross-method differences.  Adds: Jacobi vs Gauss-Seidel
fixed-point agreement, and a vectorization-correctness oracle comparing the
batched observation terms against a direct per-(i,j) loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tame.inference import (
    TemporalAMENaiveMFVI,
    TemporalAMEStructuredMFVI,
    cavi,
)
from tame.models import TemporalAMEModel


def _offdiag_cross_blocks(cov, r):
    d = 2 + 2 * r
    return np.concatenate([
        np.asarray(cov[..., :2, 2:]).ravel(),
        np.asarray(cov[..., 2:, :2]).ravel(),
    ])


class TestObservationTermOracle:
    """The batched sufficient-statistics assembly must equal the direct
    per-(i, j, t) Jacobian accumulation (reference ``naive_mf.py:284-376``)."""

    def _direct_obs_terms(self, Y, X_mean, R_inv, i, t, r):
        d = 2 + 2 * r
        n = Y.shape[0]
        P = np.zeros((d, d))
        eta = np.zeros(d)
        for j in range(n):
            if j == i:
                continue
            J = np.zeros((2, d))
            J[0, 0] = 1.0
            J[0, 2:2 + r] = X_mean[j, t, 2 + r:]  # V_j
            J[1, 1] = 1.0
            J[1, 2 + r:] = X_mean[j, t, 2:2 + r]  # U_j
            y = Y[i, j, t]
            P += J.T @ R_inv @ J
            eta += J.T @ R_inv @ y
        return P, eta

    def test_matches_direct_loop(self, temporal_data):
        m = temporal_data["model"]
        Y = np.asarray(temporal_data["Y"])
        key = jax.random.PRNGKey(0)
        X_mean = np.asarray(jax.random.normal(key, (m.n, m.T, m.d)))
        R_inv = np.asarray(m.R_inv)

        from tame.ops import dyad as dyad_ops
        _, _, U, V = dyad_ops.split_state(jnp.asarray(X_mean), m.r)
        P_all = np.asarray(cavi._obs_precision(U, V, jnp.asarray(R_inv)))
        obs = cavi.precompute_obs_constants(jnp.asarray(Y),
                                            jnp.asarray(R_inv))
        eta_all = np.asarray(cavi._obs_nat_param(
            obs, jnp.asarray(X_mean), m.r, jnp.asarray(R_inv),
            corrected=False))

        for (i, t) in [(0, 0), (3, 2), (m.n - 1, m.T - 1)]:
            P_ref, eta_ref = self._direct_obs_terms(Y, X_mean, R_inv, i, t,
                                                    m.r)
            assert np.allclose(P_all[i, t], P_ref, atol=1e-4), (i, t)
            assert np.allclose(eta_all[i, t], eta_ref, atol=1e-4), (i, t)


class TestNaiveMF:
    def test_init_shapes_and_diagonal(self, temporal_data):
        vi = TemporalAMENaiveMFVI(temporal_data["model"])
        m = temporal_data["model"]
        assert vi.X_mean.shape == (m.n, m.T, m.d)
        assert vi.X_cov.shape == (m.n, m.T, m.d, m.d)
        cov = np.asarray(vi.X_cov)
        off = cov - np.eye(m.d) * np.diagonal(cov, axis1=-2, axis2=-1)[..., None, :] * np.eye(m.d)
        # all off-diagonal entries zero at init
        mask = ~np.eye(m.d, dtype=bool)
        assert np.allclose(cov[..., mask], 0.0)

    def test_fit_runs_and_history(self, temporal_data):
        vi = TemporalAMENaiveMFVI(temporal_data["model"], learning_rate=0.7)
        h = vi.fit(max_iter=10, verbose=False)
        assert len(h["elbo"]) == 10
        assert len(h["reconstruction_error"]) == 10
        assert np.all(np.isfinite(h["elbo"]))

    def test_structure_preserved_after_fit(self, temporal_data):
        vi = TemporalAMENaiveMFVI(temporal_data["model"], learning_rate=0.7)
        vi.fit(max_iter=5, verbose=False)
        cov = np.asarray(vi.X_cov)
        d = cov.shape[-1]
        mask = ~np.eye(d, dtype=bool)
        assert np.allclose(cov[..., mask], 0.0, atol=1e-8)

    def test_predict_forward(self, temporal_data):
        m = temporal_data["model"]
        vi = TemporalAMENaiveMFVI(m)
        pred = vi.predict_forward(n_steps=3)
        assert pred.shape == (m.n, 3, m.d)
        # AR(1) with phi<1: prediction magnitudes decay
        norms = np.linalg.norm(np.asarray(pred), axis=-1).mean(0)
        assert norms[2] < norms[0] + 1e-6


class TestStructuredMF:
    def test_good_has_full_covariance(self, temporal_data):
        vi = TemporalAMEStructuredMFVI(temporal_data["model"],
                                       factorization="good")
        vi.fit(max_iter=3, verbose=False)
        cross = _offdiag_cross_blocks(vi.X_cov, vi.r)
        assert np.abs(cross).max() > 0  # cross blocks populated

    def test_bad_zero_cross_blocks_preserved(self, temporal_data):
        vi = TemporalAMEStructuredMFVI(temporal_data["model"],
                                       factorization="bad",
                                       learning_rate=0.7)
        vi.fit(max_iter=5, verbose=False)
        cross = _offdiag_cross_blocks(vi.X_cov, vi.r)
        assert np.allclose(cross, 0.0, atol=1e-8)

    def test_invalid_factorization_raises(self, temporal_data):
        with pytest.raises(ValueError):
            TemporalAMEStructuredMFVI(temporal_data["model"],
                                      factorization="ugly")

    def test_requires_data(self, temporal_network_params):
        model = TemporalAMEModel(**temporal_network_params)
        with pytest.raises(ValueError):
            TemporalAMEStructuredMFVI(model)

    def test_factorization_type(self, temporal_data):
        vi = TemporalAMEStructuredMFVI(temporal_data["model"],
                                       factorization="bad")
        assert vi.get_factorization_type() == "bad"

    def test_covariances_positive_definite(self, temporal_data):
        vi = TemporalAMEStructuredMFVI(temporal_data["model"],
                                       factorization="good",
                                       learning_rate=0.7)
        vi.fit(max_iter=10, verbose=False)
        eigs = np.linalg.eigvalsh(np.asarray(vi.X_cov))
        assert np.all(eigs > 0)


class TestFitBehavior:
    def test_elbo_improves(self, temporal_data):
        vi = TemporalAMEStructuredMFVI(temporal_data["model"],
                                       factorization="good",
                                       learning_rate=0.7)
        h = vi.fit(max_iter=30, verbose=False)
        assert h["elbo"][-1] > h["elbo"][0]
        assert h["reconstruction_error"][-1] < h["reconstruction_error"][0]

    def test_convergence_detection(self, temporal_data):
        """With a loose tolerance the fit should stop before max_iter.

        Jacobi updates need more damping than the reference's Gauss-Seidel
        sweep at the same problem size, hence lr=0.5 here."""
        vi = TemporalAMEStructuredMFVI(temporal_data["model"],
                                       factorization="good",
                                       learning_rate=0.5)
        h = vi.fit(max_iter=200, tolerance=1e-2, verbose=False)
        assert len(h["elbo"]) < 200

    def test_learning_rate_sensitivity(self, temporal_data):
        """Higher damping moves faster initially
        (reference ``test_inference.py:247-266``)."""
        slow = TemporalAMENaiveMFVI(temporal_data["model"],
                                    learning_rate=0.01)
        fast = TemporalAMENaiveMFVI(temporal_data["model"],
                                    learning_rate=0.7)
        hs = slow.fit(max_iter=5, verbose=False)
        hf = fast.fit(max_iter=5, verbose=False)
        assert (hf["reconstruction_error"][-1]
                < hs["reconstruction_error"][-1])

    def test_methods_differ(self, temporal_data):
        naive = TemporalAMENaiveMFVI(temporal_data["model"],
                                     learning_rate=0.7)
        good = TemporalAMEStructuredMFVI(temporal_data["model"],
                                         factorization="good",
                                         learning_rate=0.7)
        hn = naive.fit(max_iter=10, verbose=False)
        hg = good.fit(max_iter=10, verbose=False)
        assert not np.allclose(np.asarray(naive.X_cov),
                               np.asarray(good.X_cov))

    def test_verbose_output(self, temporal_data, capsys):
        vi = TemporalAMENaiveMFVI(temporal_data["model"], learning_rate=0.7)
        vi.fit(max_iter=3, verbose=True, check_every=1)
        out = capsys.readouterr().out
        assert "ELBO" in out
        assert "Iter" in out


class TestJacobiVsSeq:
    @pytest.mark.slow
    def test_fixed_points_agree(self):
        """Jacobi (batched) and Gauss-Seidel (reference order) must reach the
        same fixed point on a well-damped problem."""
        model = TemporalAMEModel(n_nodes=8, n_time=4, latent_dim=1, seed=11)
        model.generate_data()
        vj = TemporalAMEStructuredMFVI(model, factorization="good",
                                       learning_rate=0.7,
                                       update_mode="jacobi")
        vs = TemporalAMEStructuredMFVI(model, factorization="good",
                                       learning_rate=0.7, update_mode="seq")
        vj.fit(max_iter=300, tolerance=1e-9, verbose=False)
        vs.fit(max_iter=300, tolerance=1e-9, verbose=False)
        mse_j = model.compute_temporal_reconstruction_error(vj.X_mean)
        mse_s = model.compute_temporal_reconstruction_error(vs.X_mean)
        assert abs(mse_j - mse_s) / mse_s < 0.05
        # state means agree closely at the common fixed point
        assert np.allclose(np.asarray(vj.X_mean), np.asarray(vs.X_mean),
                           atol=0.05)


class TestBlockGaussSeidel:
    def test_block_matches_jacobi_fixed_point(self):
        """Block GS and Jacobi share fixed points; converged states must
        agree on a well-damped small problem."""
        from tame.inference import cavi
        from tame.models import TemporalAMEModel
        import jax

        model = TemporalAMEModel(n_nodes=8, n_time=4, latent_dim=1, seed=3)
        Y, _ = model.generate_data(return_latents=True)
        init = cavi.init_state(jax.random.PRNGKey(0), 8, 4, 4, "full",
                               0.1, 0.5)
        out_j = cavi.fit_cavi(Y, model.params, init, structure="full",
                              update_mode="jacobi", max_iter=400,
                              learning_rate=0.5, tolerance=1e-10)
        out_b = cavi.fit_cavi(Y, model.params, init, structure="full",
                              update_mode="block", max_iter=400,
                              learning_rate=0.5, tolerance=1e-10,
                              num_blocks=4)
        out_s = cavi.fit_cavi(Y, model.params, init, structure="full",
                              update_mode="seq", max_iter=400,
                              learning_rate=0.5, tolerance=1e-10)
        # X is identified only up to rotation/sign of (U, V): different
        # update orders may converge to equivalent-but-rotated optima, so
        # compare the identified dyadic means and the ELBO.
        from tame.ops import dyad as dyad_ops

        mu_j = np.asarray(dyad_ops.dyadic_mean_temporal(out_j.X_mean, 1))
        mu_b = np.asarray(dyad_ops.dyadic_mean_temporal(out_b.X_mean, 1))
        mu_s = np.asarray(dyad_ops.dyadic_mean_temporal(out_s.X_mean, 1))
        assert np.allclose(mu_j, mu_b, atol=0.05)
        assert np.allclose(mu_s, mu_b, atol=0.05)
        e_j = float(np.asarray(out_j.elbo_history)[int(out_j.n_iter) - 1])
        e_b = float(np.asarray(out_b.elbo_history)[int(out_b.n_iter) - 1])
        assert abs(e_j - e_b) / abs(e_b) < 0.02

    @pytest.mark.slow
    def test_block_stable_where_jacobi_oscillates(self):
        """At moderate n the block sweep must converge at a damping where
        pure Jacobi oscillates (the reason the mode exists)."""
        from tame.inference import cavi
        from tame.models import TemporalAMEModel
        import jax

        model = TemporalAMEModel(n_nodes=48, n_time=4, latent_dim=2,
                                 seed=1)
        Y, _ = model.generate_data(return_latents=True)
        init = cavi.init_state(jax.random.PRNGKey(0), 48, 4, 6, "full",
                               0.1, 0.5)
        out_j = cavi.fit_cavi(Y, model.params, init, structure="full",
                              update_mode="jacobi", max_iter=50,
                              learning_rate=0.8, tolerance=0.0)
        out_b = cavi.fit_cavi(Y, model.params, init, structure="full",
                              update_mode="block", max_iter=50,
                              learning_rate=0.8, tolerance=0.0)
        mse_j = float(np.asarray(out_j.mse_history)[49])
        mse_b = float(np.asarray(out_b.mse_history)[49])
        assert mse_b < mse_j * 0.9

    def test_block_requires_divisibility(self):
        from tame.inference import cavi
        from tame.models import TemporalAMEModel
        import jax

        model = TemporalAMEModel(n_nodes=7, n_time=3, latent_dim=1, seed=0)
        Y, _ = model.generate_data(return_latents=True)
        init = cavi.init_state(jax.random.PRNGKey(0), 7, 3, 4, "full",
                               0.1, 0.5)
        with pytest.raises(ValueError):
            cavi.fit_cavi(Y, model.params, init, structure="full",
                          update_mode="block", max_iter=2,
                          num_blocks=3)
        # auto num_blocks picks a divisor (7 -> 7)
        out = cavi.fit_cavi(Y, model.params, init, structure="full",
                            update_mode="block", max_iter=2,
                            learning_rate=0.5)
        assert np.all(np.isfinite(np.asarray(out.X_mean)))


class TestCorrectedMode:
    @pytest.mark.slow
    def test_corrected_improves_fixed_point(self):
        """The reference's natural parameter omits the other-node offsets
        (SURVEY.md §2C-4), biasing its fixed point; the corrected update
        must converge to a substantially better reconstruction."""
        model = TemporalAMEModel(n_nodes=12, n_time=6, latent_dim=2,
                                 seed=4)
        Y, _ = model.generate_data(return_latents=True)
        init = cavi.init_state(jax.random.PRNGKey(0), 12, 6, 6, "full",
                               0.1, 0.5)
        biased = cavi.fit_cavi(Y, model.params, init, structure="full",
                               update_mode="block", max_iter=300,
                               learning_rate=0.7, tolerance=1e-7,
                               num_blocks=4, corrected=False)
        exact = cavi.fit_cavi(Y, model.params, init, structure="full",
                              update_mode="block", max_iter=300,
                              learning_rate=0.7, tolerance=1e-7,
                              num_blocks=4, corrected=True)
        mse_b = float(np.asarray(biased.mse_history)[int(biased.n_iter) - 1])
        mse_e = float(np.asarray(exact.mse_history)[int(exact.n_iter) - 1])
        assert mse_e < 0.8 * mse_b

    def test_corrected_seq_rejected(self):
        model = TemporalAMEModel(n_nodes=6, n_time=3, latent_dim=1, seed=0)
        Y, _ = model.generate_data(return_latents=True)
        init = cavi.init_state(jax.random.PRNGKey(0), 6, 3, 4, "full",
                               0.1, 0.5)
        with pytest.raises(ValueError, match="corrected"):
            cavi.fit_cavi(Y, model.params, init, structure="full",
                          update_mode="seq", corrected=True)

    def test_jacobi_and_block_corrected_agree(self):
        model = TemporalAMEModel(n_nodes=8, n_time=4, latent_dim=1, seed=6)
        Y, _ = model.generate_data(return_latents=True)
        init = cavi.init_state(jax.random.PRNGKey(0), 8, 4, 4, "full",
                               0.1, 0.5)
        from tame.ops import dyad as dyad_ops

        oj = cavi.fit_cavi(Y, model.params, init, structure="full",
                           update_mode="jacobi", max_iter=400,
                           learning_rate=0.5, tolerance=1e-10,
                           corrected=True)
        ob = cavi.fit_cavi(Y, model.params, init, structure="full",
                           update_mode="block", max_iter=400,
                           learning_rate=0.5, tolerance=1e-10,
                           num_blocks=4, corrected=True)
        mu_j = np.asarray(dyad_ops.dyadic_mean_temporal(oj.X_mean, 1))
        mu_b = np.asarray(dyad_ops.dyadic_mean_temporal(ob.X_mean, 1))
        assert np.allclose(mu_j, mu_b, atol=0.05)


class TestSmoothedEngine:
    @pytest.mark.slow
    def test_smoothed_matches_or_beats_good(self):
        from tame.inference import (
            TemporalAMESmoothedVI,
            TemporalAMEStructuredMFVI,
        )

        model = TemporalAMEModel(n_nodes=10, n_time=6, latent_dim=2,
                                 seed=8)
        model.generate_data()
        good = TemporalAMEStructuredMFVI(model, factorization="good",
                                         learning_rate=0.7,
                                         corrected=True)
        hg = good.fit(max_iter=300, tolerance=1e-7, verbose=False)
        sm = TemporalAMESmoothedVI(model, learning_rate=0.7)
        hs = sm.fit(max_iter=300, tolerance=1e-7, verbose=False)
        assert (hs["reconstruction_error"][-1]
                <= hg["reconstruction_error"][-1] * 1.05)

    @pytest.mark.slow
    def test_fused_smoother_kernel_matches_scan(self):
        """Pallas forward-backward kernel vs the vmapped lax.scan solver
        on random SPD block-tridiagonal systems (interpret mode on CPU)."""
        from tame.ops.fused_smoother import fused_smoother
        from tame.ops.tridiag import block_tridiag_smoother

        key = jax.random.PRNGKey(0)
        n, T, d = 5, 7, 6
        A = jax.random.normal(key, (n, T, d, d))
        D = jnp.einsum("ntij,ntkj->ntik", A, A) + 3.0 * jnp.eye(d)
        O = 0.3 * jax.random.normal(jax.random.fold_in(key, 1), (d, d))
        b = jax.random.normal(jax.random.fold_in(key, 2), (n, T, d))

        ref = jax.vmap(lambda Di, bi: block_tridiag_smoother(Di, O, bi))(
            D, b)
        got = fused_smoother(D, O, b, interpret=True)
        assert np.allclose(np.asarray(ref.mean), np.asarray(got.mean),
                           atol=1e-4)
        assert np.allclose(np.asarray(ref.cov), np.asarray(got.cov),
                           atol=1e-4)
        assert np.allclose(np.asarray(ref.cross_cov),
                           np.asarray(got.cross_cov), atol=1e-4)
        assert np.allclose(np.asarray(ref.logdet), np.asarray(got.logdet),
                           rtol=1e-5)

    @pytest.mark.slow
    def test_fused_smoothed_fit_matches_scan_fit(self):
        """Whole smoothed fit through the Pallas kernel path vs the scan
        path.  Pre-convergence trajectories are chaotic (a contracting map
        only near the fixed point), so per-step float noise amplifies —
        the meaningful check is agreement of the converged fixed point."""
        from tame.inference.smoothed import (
            fit_cavi_smoothed,
            init_smoothed_state,
        )

        model = TemporalAMEModel(n_nodes=6, n_time=4, latent_dim=1, seed=3)
        Y, _ = model.generate_data(return_latents=True)
        init = init_smoothed_state(jax.random.PRNGKey(0), 6, 4, 4)
        a = fit_cavi_smoothed(Y, model.params, init, max_iter=256,
                              learning_rate=0.5, tolerance=0.0,
                              fused=False)
        b = fit_cavi_smoothed(Y, model.params, init, max_iter=256,
                              learning_rate=0.5, tolerance=0.0, fused=True)
        assert np.allclose(np.asarray(a.state.X_mean),
                           np.asarray(b.state.X_mean), atol=1e-3)
        assert np.allclose(np.asarray(a.state.X_cov),
                           np.asarray(b.state.X_cov), atol=1e-3)
        ea = float(np.asarray(a.elbo_history)[255])
        eb = float(np.asarray(b.elbo_history)[255])
        assert abs(ea - eb) / abs(ea) < 1e-4

    def test_smoothed_state_shapes(self):
        from tame.inference import TemporalAMESmoothedVI

        model = TemporalAMEModel(n_nodes=6, n_time=4, latent_dim=1, seed=1)
        model.generate_data()
        sm = TemporalAMESmoothedVI(model)
        sm.fit(max_iter=5, verbose=False)
        assert sm.X_mean.shape == (6, 4, 4)
        assert sm.X_cov.shape == (6, 4, 4, 4)
        assert sm.X_cross.shape == (6, 3, 4, 4)
        # marginal covariances SPD
        eigs = np.linalg.eigvalsh(np.asarray(sm.X_cov))
        assert np.all(eigs > 0)

    def test_smoothed_warm_init(self):
        """init_mode='warm': runs, and reaches at least as good a final
        ELBO as the random init under the same budget."""
        from tame.inference import TemporalAMESmoothedVI

        model = TemporalAMEModel(n_nodes=10, n_time=5, latent_dim=2,
                                 seed=1)
        model.generate_data()
        w = TemporalAMESmoothedVI(model, init_mode="warm")
        hw = w.fit(max_iter=60, tolerance=1e-6, verbose=False)
        rnd = TemporalAMESmoothedVI(model, init_mode="random")
        hr = rnd.fit(max_iter=60, tolerance=1e-6, verbose=False)
        assert hw["elbo"][-1] >= hr["elbo"][-1] - 1.0

    def test_smoothed_segmented_checkpoint_resume(self, tmp_path):
        """Segmented in-fit checkpointing + kill-and-resume reproduce the
        uninterrupted fit BITWISE (cf. the CAVI engine's guarantee)."""
        from tame.inference import TemporalAMESmoothedVI

        model = TemporalAMEModel(n_nodes=8, n_time=4, latent_dim=1,
                                 seed=3)
        model.generate_data()
        a = TemporalAMESmoothedVI(model, seed=3)
        ha = a.fit(max_iter=40, tolerance=1e-5, verbose=False)
        td = str(tmp_path / "ck")
        b = TemporalAMESmoothedVI(model, seed=3)
        b.fit(max_iter=40, tolerance=1e-5, verbose=False,
              checkpoint_every=7, ckpt_dir=td)
        assert ha["elbo"] == b.history["elbo"]
        assert np.array_equal(np.asarray(a.X_mean), np.asarray(b.X_mean))
        # kill after 15 iterations, resume to the same total budget
        c = TemporalAMESmoothedVI(model, seed=3)
        c.fit(max_iter=15, tolerance=1e-5, verbose=False,
              checkpoint_every=7, ckpt_dir=td)
        d = TemporalAMESmoothedVI(model, seed=3)
        d.fit(max_iter=40, tolerance=1e-5, verbose=False,
              checkpoint_every=7, ckpt_dir=td, resume=True)
        assert d.history["elbo"] == ha["elbo"]
        assert np.array_equal(np.asarray(a.X_mean), np.asarray(d.X_mean))
        assert np.array_equal(np.asarray(a.X_cross),
                              np.asarray(d.X_cross))

    @pytest.mark.slow
    def test_smoothed_stats_and_mixed_precision(self):
        """The production fast path for the smoothed family: stats
        diagnostics match the exact pass; bf16 weights track f32 MSE."""
        from tame.inference.smoothed import (
            fit_cavi_smoothed,
            init_smoothed_state,
        )

        model = TemporalAMEModel(n_nodes=12, n_time=6, latent_dim=2,
                                 seed=2)
        Y, _ = model.generate_data(return_latents=True)
        init = init_smoothed_state(jax.random.PRNGKey(0), 12, 6, 6, 0.1)
        kw = dict(max_iter=30, learning_rate=0.8, tolerance=0.0)
        a = fit_cavi_smoothed(Y, model.params, init, diag_mode="exact",
                              **kw)
        b = fit_cavi_smoothed(Y, model.params, init, diag_mode="stats",
                              **kw)
        ea = np.asarray(a.elbo_history)[:30]
        eb = np.asarray(b.elbo_history)[:30]
        assert np.max(np.abs((ea - eb) / ea)) < 1e-4
        assert np.array_equal(np.asarray(a.state.X_mean),
                              np.asarray(b.state.X_mean))
        c = fit_cavi_smoothed(Y, model.params, init, diag_mode="stats",
                              mixed_precision=True, **kw)
        ma = float(np.asarray(a.mse_history)[29])
        mc = float(np.asarray(c.mse_history)[29])
        assert abs(mc - ma) / ma < 0.05


class TestElboEvery:
    def test_sparse_diagnostics_match_dense_trajectory(self):
        """elbo_every=k must leave the update trajectory unchanged: the
        evaluated points agree with the every-iteration run."""
        model = TemporalAMEModel(n_nodes=8, n_time=4, latent_dim=1, seed=2)
        Y, _ = model.generate_data(return_latents=True)
        init = cavi.init_state(jax.random.PRNGKey(0), 8, 4, 4, "full",
                               0.1, 0.5)
        dense = cavi.fit_cavi(Y, model.params, init, structure="full",
                              update_mode="block", max_iter=20,
                              learning_rate=0.7, tolerance=0.0)
        sparse = cavi.fit_cavi(Y, model.params, init, structure="full",
                               update_mode="block", max_iter=20,
                               learning_rate=0.7, tolerance=0.0,
                               elbo_every=5)
        eh_d = np.asarray(dense.elbo_history)[:20]
        eh_s = np.asarray(sparse.elbo_history)[:20]
        # evaluated slots: iterations 4, 9, 14, 19 (0-indexed)
        for it in (4, 9, 14, 19):
            assert eh_s[it] == pytest.approx(eh_d[it], rel=1e-5)
        # skipped slots are NaN
        assert np.isnan(eh_s[0]) and np.isnan(eh_s[7])
        assert np.allclose(np.asarray(dense.X_mean),
                           np.asarray(sparse.X_mean))


class TestFromConfig:
    def test_engine_from_config(self, temporal_data):
        from tame.config import InferenceConfig
        from tame.inference import (
            TemporalAMECaviVI,
            TemporalAMEStructuredMFVI,
        )

        cfg = InferenceConfig(structure="block", learning_rate=0.5,
                              update_mode="jacobi", seed=7)
        vi = TemporalAMEStructuredMFVI.from_config(temporal_data["model"],
                                                   cfg)
        assert vi.get_factorization_type() == "bad"
        assert vi.lr == 0.5
        assert vi.update_mode == "jacobi"
        vi2 = TemporalAMECaviVI.from_config(temporal_data["model"], cfg)
        assert vi2.structure == "block"


class TestFastDiagnostics:
    """The fwd-half residual statistics must reproduce the stacked-mean
    ELBO/MSE exactly (up to summation order) under the reciprocity
    invariant."""

    @pytest.mark.slow
    def test_fwd_stats_match_stacked(self):
        from tame.ops import dyad as dyad_ops

        model = TemporalAMEModel(n_nodes=9, n_time=5, latent_dim=2, seed=3)
        Y, _ = model.generate_data(return_latents=True)
        n, T, d = 9, 5, 6
        state = cavi.init_state(jax.random.PRNGKey(1), n, T, d, "full",
                                0.3, 0.5)
        pri = cavi.precompute_priors(model.params)

        mu = dyad_ops.dyadic_mean_temporal(state.X_mean, 2)
        elbo_ref = float(cavi.compute_elbo(Y, model.params, pri, state,
                                           "full", mu_dyadic=mu))
        mse_ref = float(dyad_ops.masked_sq_error_temporal(Y, mu))

        fwd = dyad_ops.dyadic_fwd_temporal(state.X_mean, 2)
        sq, cross = dyad_ops.residual_stats_from_fwd(Y, fwd)
        p_, q_ = model.params.R_inv[0, 0], model.params.R_inv[0, 1]
        quad_sum = p_ * sq + q_ * cross
        elbo_fast = float(cavi._elbo_from_quad(quad_sum, model.params, pri,
                                               state, "full"))
        mse_fast = float(2.0 * sq / (n * (n - 1) * T))

        assert elbo_fast == pytest.approx(elbo_ref, rel=1e-5)
        assert mse_fast == pytest.approx(mse_ref, rel=1e-5)


class TestMixedPrecision:
    def test_tracks_f32_fixed_point(self):
        """bf16 dyad weights must converge to (numerically) the same
        optimum: final MSE within 0.5 % relative of the float32 run."""
        model = TemporalAMEModel(n_nodes=12, n_time=6, latent_dim=2,
                                 ar_coefficient=0.8, rho_dyadic=0.5,
                                 seed=11)
        Y, _ = model.generate_data(return_latents=True)
        init = cavi.init_state(jax.random.PRNGKey(0), 12, 6, 6, "full",
                               0.1, 0.5)
        kw = dict(structure="full", update_mode="block", max_iter=100,
                  learning_rate=0.7, tolerance=0.0)
        out32 = cavi.fit_cavi(Y, model.params, init, **kw)
        outmp = cavi.fit_cavi(Y, model.params, init, mixed_precision=True,
                              **kw)
        m32 = float(np.asarray(out32.mse_history)[99])
        mmp = float(np.asarray(outmp.mse_history)[99])
        assert mmp == pytest.approx(m32, rel=5e-3)
        assert np.max(np.abs(np.asarray(outmp.X_mean - out32.X_mean))) < 0.05

    def test_seq_mode_rejected(self):
        model = TemporalAMEModel(n_nodes=6, n_time=3, latent_dim=1, seed=0)
        Y, _ = model.generate_data(return_latents=True)
        init = cavi.init_state(jax.random.PRNGKey(0), 6, 3, 4, "full",
                               0.1, 0.5)
        with pytest.raises(ValueError, match="mixed_precision"):
            cavi.fit_cavi(Y, model.params, init, structure="full",
                          update_mode="seq", mixed_precision=True)


class TestStatsDiagnostics:
    @pytest.mark.slow
    @pytest.mark.parametrize("rho", [0.0, 0.5, 0.8])
    def test_matches_exact_history(self, rho):
        """diag_mode='stats' must reproduce the exact ELBO/MSE histories to
        float32 reduction error while never reading O(n^2 T) tensors."""
        model = TemporalAMEModel(n_nodes=14, n_time=6, latent_dim=2,
                                 rho_dyadic=rho, seed=5)
        Y, _ = model.generate_data(return_latents=True)
        init = cavi.init_state(jax.random.PRNGKey(3), 14, 6, 6, "full",
                               0.1, 0.5)
        kw = dict(structure="full", update_mode="block", max_iter=30,
                  learning_rate=0.7, tolerance=0.0)
        exact = cavi.fit_cavi(Y, model.params, init, **kw)
        stats = cavi.fit_cavi(Y, model.params, init, diag_mode="stats",
                              **kw)
        eh_e = np.asarray(exact.elbo_history)[:30]
        eh_s = np.asarray(stats.elbo_history)[:30]
        mh_e = np.asarray(exact.mse_history)[:30]
        mh_s = np.asarray(stats.mse_history)[:30]
        assert np.max(np.abs(eh_e - eh_s) / np.abs(eh_e)) < 1e-4
        assert np.max(np.abs(mh_e - mh_s) / np.abs(mh_e)) < 1e-4
        # diagnostics never feed back into updates — identical on CPU;
        # on TPU (TAME_TEST_TPU=1) the two programs fuse differently and
        # the update itself rounds differently, so compare to tolerance
        assert np.allclose(np.asarray(exact.X_mean),
                           np.asarray(stats.X_mean), atol=1e-3)

    def test_unknown_mode_rejected(self):
        model = TemporalAMEModel(n_nodes=6, n_time=3, latent_dim=1, seed=0)
        Y, _ = model.generate_data(return_latents=True)
        init = cavi.init_state(jax.random.PRNGKey(0), 6, 3, 4, "full",
                               0.1, 0.5)
        with pytest.raises(ValueError, match="diag_mode"):
            cavi.fit_cavi(Y, model.params, init, diag_mode="bogus")

    def test_dual_contract_kernel(self):
        """One-pass row+column contraction vs two einsums (bf16-quantized
        reference), including the padded path."""
        from tame.ops.dual_contract import dual_contract

        key = jax.random.PRNGKey(0)
        T, n, m = 3, 20, 4
        y0 = jax.random.normal(key, (T, n, n))
        Z = jax.random.normal(jax.random.fold_in(key, 1), (T, n, m))
        row, col = dual_contract(y0, Z, interpret=True)
        y0b = y0.astype(jnp.bfloat16).astype(jnp.float32)
        Zb = Z.astype(jnp.bfloat16).astype(jnp.float32)
        rref = jnp.einsum("tij,tjm->tim", y0b, Zb)
        cref = jnp.einsum("tij,tim->tjm", y0b, Zb)
        assert np.allclose(np.asarray(row), np.asarray(rref), atol=1e-5)
        assert np.allclose(np.asarray(col), np.asarray(cref), atol=1e-5)

    @pytest.mark.slow
    def test_mixed_stats_matches_exact_history(self):
        """mixed_precision + diag_mode='stats' recovers A/B from ONE W0
        pass via the W1 = W0' reciprocity identity
        (cavi._data_mean_cross_terms); histories must still track the
        exact (f32) diagnostics to bf16 data-quantization error."""
        model = TemporalAMEModel(n_nodes=14, n_time=6, latent_dim=2,
                                 rho_dyadic=0.5, seed=5)
        Y, _ = model.generate_data(return_latents=True)
        init = cavi.init_state(jax.random.PRNGKey(3), 14, 6, 6, "full",
                               0.1, 0.5)
        kw = dict(structure="full", update_mode="block", max_iter=30,
                  learning_rate=0.7, tolerance=0.0, mixed_precision=True)
        exact = cavi.fit_cavi(Y, model.params, init, **kw)
        stats = cavi.fit_cavi(Y, model.params, init, diag_mode="stats",
                              **kw)
        eh_e = np.asarray(exact.elbo_history)[:30]
        eh_s = np.asarray(stats.elbo_history)[:30]
        mh_e = np.asarray(exact.mse_history)[:30]
        mh_s = np.asarray(stats.mse_history)[:30]
        # bf16 stores ~8 mantissa bits -> ~0.4 % relative quantization on
        # the data; the residual statistics inherit it
        assert np.max(np.abs(eh_e - eh_s) / np.abs(eh_e)) < 1e-2
        assert np.max(np.abs(mh_e - mh_s) / np.abs(mh_e)) < 1e-2
        assert np.allclose(np.asarray(exact.X_mean),
                           np.asarray(stats.X_mean))


class TestWarmInit:
    """Data-driven warm start (cavi.warm_init_state)."""

    def _problem(self, n=24, T=6, r=2, seed=3):
        model = TemporalAMEModel(n_nodes=n, n_time=T, latent_dim=r,
                                 seed=seed)
        Y, _ = model.generate_data(return_latents=True)
        return model, Y

    def test_shapes_and_determinism(self):
        model, Y = self._problem()
        a = cavi.warm_init_state(Y, model.params, structure="full")
        b = cavi.warm_init_state(Y, model.params, structure="full")
        assert a.X_mean.shape == (24, 6, 6)
        assert a.X_cov.shape == (24, 6, 6, 6)
        assert np.array_equal(np.asarray(a.X_mean), np.asarray(b.X_mean))
        assert np.all(np.isfinite(np.asarray(a.X_mean)))
        # centroid is constant over time (the AR chain differentiates it)
        assert np.allclose(np.asarray(a.X_mean[:, 0]),
                           np.asarray(a.X_mean[:, -1]))

    def test_warm_start_explains_data(self):
        """The warm centroid alone must already reconstruct much better
        than the zero/noise init (it is a least-squares + top-r fit of
        the time-averaged network)."""
        from tame.ops import dyad as dyad_ops

        model, Y = self._problem()
        warm = cavi.warm_init_state(Y, model.params, structure="full")
        mu = dyad_ops.dyadic_mean_temporal(warm.X_mean, 2)
        mse_warm = float(dyad_ops.masked_sq_error_temporal(Y, mu))
        mse_zero = float(dyad_ops.masked_sq_error_temporal(
            Y, jnp.zeros_like(mu)))
        assert mse_warm < 0.5 * mse_zero

    @pytest.mark.parametrize("structure", ["diag", "full"])
    def test_warm_fixed_point_at_least_as_good(self, structure):
        """A warm-started fit must converge to an optimum at least as
        good as the random init's (measured: sometimes strictly better —
        the random init can satisfy the tolerance rule at a worse fixed
        point).  The 'block' (bad-SMF) control is excluded: its wrong
        factorization is init-sensitive by design with no ordering
        guarantee either way."""
        model, Y = self._problem()
        lr = 1.0
        cold = cavi.init_state(jax.random.PRNGKey(0), 24, 6, 6,
                               structure, 0.1, 0.5)
        warm = cavi.warm_init_state(Y, model.params, structure=structure)
        outs = {}
        for label, st in [("cold", cold), ("warm", warm)]:
            out = cavi.fit_cavi(Y, model.params, st, structure=structure,
                                update_mode="block", max_iter=512,
                                learning_rate=lr, tolerance=1e-4)
            ni = int(out.n_iter)
            outs[label] = float(np.asarray(out.elbo_history)[ni - 1])
            assert bool(out.converged)
        assert outs["warm"] >= outs["cold"] - abs(outs["cold"]) * 0.01

    def test_engine_init_mode(self):
        from tame.inference import TemporalAMEStructuredMFVI

        model, Y = self._problem()
        vi = TemporalAMEStructuredMFVI(model, factorization="good",
                                       init_mode="warm")
        h = vi.fit(max_iter=30, verbose=False)
        assert len(h["elbo"]) <= 30
        assert np.isfinite(h["elbo"][-1])
        with pytest.raises(ValueError, match="init_mode"):
            TemporalAMEStructuredMFVI(model, init_mode="bogus")


@pytest.mark.slow
class TestFusedFit:
    """Whole-fit Pallas megakernel (tame/ops/fused_fit.py) vs the XLA path.

    On CPU the kernel runs in Pallas interpret mode (fused=True forces it);
    auto-selection stays off the CPU backend, so these tests exercise the
    exact code path the TPU runs while the rest of the suite is unaffected.
    """

    def _setup(self, n=12, T=5, r=2, seed=7, rho=0.5, structure="full"):
        model = TemporalAMEModel(n_nodes=n, n_time=T, latent_dim=r,
                                 rho_dyadic=rho, seed=seed)
        Y, _ = model.generate_data(return_latents=True)
        init = cavi.init_state(jax.random.PRNGKey(seed), n, T, 2 + 2 * r,
                               structure, 0.1, 0.5)
        return model, Y, init

    @pytest.mark.parametrize("structure,corrected", [
        ("full", False), ("full", True), ("diag", False), ("block", False)])
    def test_matches_unfused(self, structure, corrected):
        model, Y, init = self._setup(structure=structure)
        kw = dict(structure=structure, update_mode="jacobi", max_iter=25,
                  learning_rate=0.7, tolerance=1e-5, corrected=corrected)
        ref = cavi.fit_cavi(Y, model.params, init, fused=False, **kw)
        fz = cavi.fit_cavi(Y, model.params, init, fused=True, **kw)
        eh_r = np.asarray(ref.elbo_history)[:25]
        eh_f = np.asarray(fz.elbo_history)[:25]
        assert np.nanmax(np.abs(eh_r - eh_f) / np.abs(eh_r)) < 1e-4
        assert np.allclose(np.asarray(ref.X_mean), np.asarray(fz.X_mean),
                           atol=1e-4)
        assert np.allclose(np.asarray(ref.X_cov), np.asarray(fz.X_cov),
                           atol=1e-4)
        assert int(ref.n_iter) == int(fz.n_iter)

    def test_convergence_freeze(self):
        """After the tolerance/patience rule fires, state and histories
        freeze: flags, n_iter and NaN padding match the early-exit path."""
        model, Y, init = self._setup(n=8, T=4)
        kw = dict(structure="full", update_mode="jacobi", max_iter=60,
                  learning_rate=0.7, tolerance=1e-3)
        ref = cavi.fit_cavi(Y, model.params, init, fused=False, **kw)
        fz = cavi.fit_cavi(Y, model.params, init, fused=True, **kw)
        assert bool(ref.converged) and bool(fz.converged)
        assert int(ref.n_iter) == int(fz.n_iter)
        it = int(ref.n_iter)
        assert np.all(np.isnan(np.asarray(fz.elbo_history)[it:]))
        assert np.allclose(np.asarray(ref.X_mean), np.asarray(fz.X_mean),
                           atol=1e-4)

    @pytest.mark.parametrize("num_blocks", [4, 12])
    def test_block_mode_matches_unfused(self, num_blocks):
        """The engine-default update_mode='block' runs in the kernel too:
        sequential in-kernel phases must reproduce cavi_step_block."""
        model, Y, init = self._setup(n=12, T=5)
        kw = dict(structure="full", update_mode="block",
                  num_blocks=num_blocks, max_iter=20, learning_rate=1.0,
                  tolerance=1e-6)
        ref = cavi.fit_cavi(Y, model.params, init, fused=False, **kw)
        fz = cavi.fit_cavi(Y, model.params, init, fused=True, **kw)
        eh_r = np.asarray(ref.elbo_history)[:20]
        eh_f = np.asarray(fz.elbo_history)[:20]
        assert np.nanmax(np.abs(eh_r - eh_f) / np.abs(eh_r)) < 1e-4
        assert np.allclose(np.asarray(ref.X_mean), np.asarray(fz.X_mean),
                           atol=1e-4)
        assert np.allclose(np.asarray(ref.X_cov), np.asarray(fz.X_cov),
                           atol=1e-4)
        assert int(ref.n_iter) == int(fz.n_iter)

    def test_default_engine_config_is_fused_supported(self):
        """The README quick-start configuration (Good SMF, block updates,
        demo scale) must be inside the megakernel envelope, so the default
        TPU path hits the kernel (VERDICT r2).  n=15 -> num_blocks=15."""
        from tame.ops import fused_fit as ff

        assert ff.fused_fit_supported(
            15, 10, 6, structure="full", update_mode="block",
            diag_mode="exact", mixed_precision=False, elbo_every=1,
            num_blocks=15)
        # envelope reaches n ~ 100 at demo-scale T
        assert ff.fused_fit_supported(
            100, 10, 6, structure="full", update_mode="block",
            diag_mode="exact", mixed_precision=False, elbo_every=1,
            num_blocks=10)

    def test_segment_carry_matches_single_run(self):
        """The convergence carry (last_elbo/pat_count) continues a fit in
        segments through the KERNEL with the same stopping behavior as
        one uninterrupted kernel run (the in-fit checkpointing path)."""
        model, Y, init = self._setup(n=8, T=4)
        kw = dict(structure="full", update_mode="jacobi",
                  learning_rate=0.7, tolerance=1e-3, fused=True)
        full = cavi.fit_cavi(Y, model.params, init, max_iter=60, **kw)
        assert bool(full.converged)
        n_full = int(full.n_iter)
        assert n_full > 15  # split point must fall before convergence

        seg1 = cavi.fit_cavi(Y, model.params, init, max_iter=15, **kw)
        st = cavi.CaviState(X_mean=seg1.X_mean, X_cov=seg1.X_cov)
        seg2 = cavi.fit_cavi(Y, model.params, st, max_iter=45,
                             carry_elbo=float(seg1.last_elbo),
                             carry_patience=int(seg1.pat_count), **kw)
        assert bool(seg2.converged)
        assert int(seg1.n_iter) + int(seg2.n_iter) == n_full
        assert np.array_equal(np.asarray(full.X_mean),
                              np.asarray(seg2.X_mean))
        eh = np.concatenate([np.asarray(seg1.elbo_history)[:15],
                             np.asarray(seg2.elbo_history)[:n_full - 15]])
        assert np.array_equal(eh, np.asarray(full.elbo_history)[:n_full])

    def test_unsupported_config_rejected(self):
        model, Y, init = self._setup(n=8, T=4)
        with pytest.raises(ValueError, match="fused=True requires"):
            cavi.fit_cavi(Y, model.params, init, diag_mode="stats",
                          fused=True)
        with pytest.raises(ValueError, match="fused=True requires"):
            cavi.fit_cavi(Y, model.params, init, update_mode="seq",
                          fused=True)

    def test_auto_off_on_cpu(self):
        """fused='auto' must not pick the interpreted kernel on CPU."""
        model, Y, init = self._setup(n=6, T=3)
        out = cavi.fit_cavi(Y, model.params, init, max_iter=3,
                            learning_rate=0.7, tolerance=0.0)
        assert int(out.n_iter) == 3  # unfused path ran (fast on CPU)


class TestMaskedFit:
    """Missing-data (masked-dyad) fits — a capability beyond the reference
    (its update loops assume a complete network, ``naive_mf.py:324-374``).
    Masked entries of Y must be *invisible* to the fit, and a full mask
    must reproduce the complete-network fit."""

    def _setup(self, n=12, T=5, r=2, seed=0):
        model = TemporalAMEModel(n_nodes=n, n_time=T, latent_dim=r,
                                 seed=seed)
        Y, _ = model.generate_data(return_latents=True)
        init = cavi.init_state(jax.random.PRNGKey(1), n, T, 2 + 2 * r,
                               "full", 0.1, 0.5)
        return model, jnp.asarray(Y), init

    @pytest.mark.slow
    @pytest.mark.parametrize("update_mode", ["jacobi", "block"])
    def test_full_mask_matches_unmasked(self, update_mode):
        model, Y, init = self._setup()
        n, T = Y.shape[0], Y.shape[2]
        full = (1.0 - jnp.eye(n))[:, :, None] * jnp.ones((n, n, T))
        kw = dict(structure="full", max_iter=40, learning_rate=0.7,
                  tolerance=0.0, update_mode=update_mode)
        if update_mode == "block":
            kw["num_blocks"] = 4
        a = cavi.fit_cavi(Y, model.params, init, **kw)
        b = cavi.fit_cavi(Y, model.params, init, mask=full, **kw)
        assert np.allclose(np.asarray(a.X_mean), np.asarray(b.X_mean),
                           atol=1e-4)
        ea = np.asarray(a.elbo_history)[:40]
        eb = np.asarray(b.elbo_history)[:40]
        assert np.max(np.abs((ea - eb) / ea)) < 1e-4

    def test_masked_entries_never_read(self):
        """Filling the hidden dyads with garbage must not change one bit
        of the fit."""
        from tame.models import random_dyad_mask

        model, Y, init = self._setup()
        mask = random_dyad_mask(jax.random.PRNGKey(7), 12, 5, 0.3)
        Yg = jnp.where(mask[..., None] == 0, 1e6, Y)
        kw = dict(structure="full", max_iter=40, learning_rate=0.7,
                  tolerance=0.0, update_mode="jacobi")
        c = cavi.fit_cavi(Y, model.params, init, mask=mask, **kw)
        d = cavi.fit_cavi(Yg, model.params, init, mask=mask, **kw)
        assert np.array_equal(np.asarray(c.X_mean), np.asarray(d.X_mean))
        assert np.array_equal(np.asarray(c.elbo_history)[:40],
                              np.asarray(d.elbo_history)[:40])

    @pytest.mark.slow
    def test_heldout_recovery(self):
        """Fitting on 70% of dyads must still recover the held-out 30%:
        held-out recon MSE within 2x of the observed-dyad MSE and far
        below the data variance."""
        from tame.models import random_dyad_mask
        from tame.ops import dyad as dyad_ops

        model, Y, init = self._setup(n=16, T=6, seed=3)
        mask = random_dyad_mask(jax.random.PRNGKey(11), 16, 6, 0.3)
        out = cavi.fit_cavi(Y, model.params, init, structure="full",
                            update_mode="block", num_blocks=4, mask=mask,
                            corrected=True, max_iter=120,
                            learning_rate=0.8, tolerance=0.0)
        fwd = dyad_ops.dyadic_fwd_temporal(out.X_mean, 2)
        e2 = np.asarray((Y[..., 0] - fwd) ** 2)
        m = np.asarray(mask)
        off = np.asarray((1.0 - jnp.eye(16))[:, :, None]
                         * jnp.ones((16, 16, 6)))
        held = off * (1.0 - m)
        mse_obs = (e2 * m).sum() / m.sum()
        mse_held = (e2 * held).sum() / held.sum()
        var_y = float(np.var(np.asarray(Y[..., 0])[off > 0]))
        assert mse_held < 2.0 * mse_obs + 0.05
        assert mse_held < 0.5 * var_y

    def test_masked_engine_and_corrected(self):
        from tame.inference import TemporalAMEStructuredMFVI
        from tame.models import random_dyad_mask

        model, Y, init = self._setup()
        mask = random_dyad_mask(jax.random.PRNGKey(2), 12, 5, 0.25)
        vi = TemporalAMEStructuredMFVI(model, factorization="good",
                                       learning_rate=0.7, mask=mask)
        h = vi.fit(max_iter=30, tolerance=0.0, verbose=False)
        assert len(h["elbo"]) == 30
        assert np.isfinite(h["elbo"]).all()

    def test_masked_rejects_unsupported_modes(self):
        model, Y, init = self._setup(n=8, T=4)
        mask = jnp.ones((8, 8, 4))
        with pytest.raises(ValueError, match="mask is supported"):
            cavi.fit_cavi(Y, model.params, init, update_mode="seq",
                          mask=mask)

    @pytest.mark.slow
    @pytest.mark.parametrize("update_mode", ["jacobi", "block"])
    def test_masked_stats_matches_exact(self, update_mode):
        """diag_mode='stats' under a mask (the masked sufficient-
        statistics expansion, cavi._masked_residual_stats) must agree
        with the masked exact residual pass to float32 reduction error —
        and must not perturb the updates at all."""
        from tame.models import random_dyad_mask

        model, Y, init = self._setup(n=14, T=6, r=2, seed=3)
        mask = random_dyad_mask(jax.random.PRNGKey(5), 14, 6, 0.35)
        kw = dict(structure="full", max_iter=40, learning_rate=0.6,
                  tolerance=0.0, update_mode=update_mode, mask=mask)
        if update_mode == "block":
            kw["num_blocks"] = 7
        a = cavi.fit_cavi(Y, model.params, init, diag_mode="exact", **kw)
        b = cavi.fit_cavi(Y, model.params, init, diag_mode="stats", **kw)
        ea = np.asarray(a.elbo_history)[:40]
        eb = np.asarray(b.elbo_history)[:40]
        ma = np.asarray(a.mse_history)[:40]
        mb = np.asarray(b.mse_history)[:40]
        assert np.max(np.abs((ea - eb) / ea)) < 1e-4
        assert np.max(np.abs((ma - mb) / ma)) < 1e-4
        assert np.array_equal(np.asarray(a.X_mean), np.asarray(b.X_mean))

    def test_masked_stats_nan_coded(self):
        """NaN-coded missing entries through the masked stats path:
        bitwise-identical to zero-coded."""
        from tame.models import random_dyad_mask

        model, Y, init = self._setup()
        mask = random_dyad_mask(jax.random.PRNGKey(7), 12, 5, 0.3)
        Ynan = jnp.where(mask[..., None] > 0, Y, jnp.nan)
        kw = dict(structure="full", max_iter=30, learning_rate=0.7,
                  tolerance=0.0, update_mode="jacobi", diag_mode="stats",
                  mask=mask)
        a = cavi.fit_cavi(Y, model.params, init, **kw)
        b = cavi.fit_cavi(Ynan, model.params, init, **kw)
        assert np.array_equal(np.asarray(a.X_mean), np.asarray(b.X_mean))
        assert np.array_equal(np.asarray(a.elbo_history),
                              np.asarray(b.elbo_history), equal_nan=True)

    def test_masked_mixed_precision_tracks_f32(self):
        """The production fast path (stats + bf16 weights AND bf16 mask)
        under a mask: final MSE within bf16 rounding of the f32 fit."""
        from tame.models import random_dyad_mask

        model, Y, init = self._setup(n=14, T=6, r=2, seed=3)
        mask = random_dyad_mask(jax.random.PRNGKey(5), 14, 6, 0.35)
        kw = dict(structure="full", max_iter=40, learning_rate=0.6,
                  tolerance=0.0, update_mode="jacobi", mask=mask)
        a = cavi.fit_cavi(Y, model.params, init, diag_mode="exact", **kw)
        b = cavi.fit_cavi(Y, model.params, init, diag_mode="stats",
                          mixed_precision=True, **kw)
        ma = float(np.asarray(a.mse_history)[39])
        mb = float(np.asarray(b.mse_history)[39])
        assert np.isfinite(mb)
        assert abs(mb - ma) / ma < 0.05

    @pytest.mark.slow
    def test_masked_warm_init_unbiased(self):
        """Masked warm init must normalize by observed counts: at heavy
        missingness the additive-effect init must NOT shrink toward zero
        by the missing fraction (the old zero-fill /(n-1) bias)."""
        from tame.models import random_dyad_mask

        model, Y, _ = self._setup(n=30, T=6, r=2, seed=9)
        n = 30
        mask = random_dyad_mask(jax.random.PRNGKey(3), n, 6, 0.5)
        dense = cavi.warm_init_state(Y, model.params, structure="full")
        masked = cavi.warm_init_state(Y, model.params, structure="full",
                                      obs_mask=mask)
        a_dense = np.asarray(dense.X_mean[:, 0, 0])
        a_masked = np.asarray(masked.X_mean[:, 0, 0])
        # The masked estimate is a noisier version of the dense one, NOT
        # a ~0.5x-shrunk one: the regression slope through the origin
        # must be near 1, far from the 0.5 the biased init produced.
        slope = float(a_dense @ a_masked / (a_dense @ a_dense))
        assert 0.8 < slope < 1.2, slope
        # NaN-coded missing entries are never read
        Ynan = jnp.where(mask[..., None] > 0, Y, jnp.nan)
        masked_nan = cavi.warm_init_state(Ynan, model.params,
                                          structure="full", obs_mask=mask)
        assert np.array_equal(np.asarray(masked.X_mean),
                              np.asarray(masked_nan.X_mean))


class TestForecastUncertainty:
    """predict_forward_with_cov / predict_dyads — forecasting with
    calibrated uncertainty (the reference's predict_forward returns means
    only, naive_mf.py:386-396; its calibration/coverage metrics have no
    producer)."""

    def _fitted(self):
        model = TemporalAMEModel(n_nodes=10, n_time=6, latent_dim=1,
                                 seed=4)
        model.generate_data()
        from tame.inference import TemporalAMEStructuredMFVI

        vi = TemporalAMEStructuredMFVI(model, factorization="good",
                                       learning_rate=0.8)
        vi.fit(max_iter=60, tolerance=0.0, verbose=False)
        return model, vi

    def test_shapes_and_symmetry(self):
        model, vi = self._fitted()
        mus, Sigs = vi.predict_forward_with_cov(3)
        assert mus.shape == (10, 3, 4) and Sigs.shape == (10, 3, 4, 4)
        # covariance grows toward the stationary value, stays SPD
        assert np.all(np.linalg.eigvalsh(np.asarray(Sigs)) > 0)
        mean, std = vi.predict_dyads(3)
        assert mean.shape == (10, 10, 3, 2) and std.shape == mean.shape
        assert np.all(np.asarray(std) > 0)
        # component 1 of dyad (i,j) is y_ji: std must be the swap
        s = np.asarray(std)
        assert np.allclose(s[..., 1], np.swapaxes(s[..., 0], 0, 1))

    def test_variance_matches_monte_carlo(self):
        """Delta-method predictive std vs 4000-sample Monte Carlo of the
        exact forecast distribution (state draw -> AR step -> dyad mean
        -> dyadic noise)."""
        model, vi = self._fitted()
        params = model.params
        n, d, r = 10, 4, 1
        mu_T = np.asarray(vi.X_mean[:, -1])
        Sig_T = np.asarray(vi.X_cov[:, -1])
        rng = np.random.default_rng(0)
        S = 4000
        chol = np.linalg.cholesky(
            Sig_T + 1e-9 * np.eye(d))                  # (n, d, d)
        xT = mu_T[None] + np.einsum(
            "ids,nis->nid", chol, rng.standard_normal((S, n, d)))
        Phi, Q = np.asarray(params.Phi), np.asarray(params.Q)
        w = np.einsum("ds,nis->nid", np.linalg.cholesky(Q),
                      rng.standard_normal((S, n, d)))
        x1 = xT @ Phi.T + w                            # (S, n, d)
        a, b = x1[..., 0], x1[..., 1]
        U, V = x1[..., 2:2 + r], x1[..., 2 + r:]
        mu_dyad = (a[:, :, None] + b[:, None, :]
                   + np.einsum("sir,sjr->sij", U, V))  # y_ij mean draws
        R00 = float(np.asarray(params.R)[0, 0])
        emp_var = mu_dyad.var(axis=0) + R00            # (n, n)

        mean, std = vi.predict_dyads(1)
        pred_var = np.asarray(std[..., 0, 0]) ** 2     # (n, n) at h=1
        off = ~np.eye(10, dtype=bool)
        rel = np.abs(pred_var[off] - emp_var[off]) / emp_var[off]
        # delta method is exact for the additive part and first-order in
        # the bilinear term; agreement should be tight on average
        assert np.median(rel) < 0.1
        assert np.mean(rel) < 0.2

    def test_coverage_near_nominal(self):
        """90% predictive intervals from predict_dyads cover ~90% of
        exact forecast-distribution draws."""
        from tame.utils.metrics import compute_coverage

        model, vi = self._fitted()
        mean, std = vi.predict_dyads(1)
        m0 = np.asarray(mean[..., 0, 0])
        s0 = np.asarray(std[..., 0, 0])
        params = model.params
        n, d, r = 10, 4, 1
        rng = np.random.default_rng(1)
        S = 500
        mu_T = np.asarray(vi.X_mean[:, -1])
        Sig_T = np.asarray(vi.X_cov[:, -1])
        chol = np.linalg.cholesky(Sig_T + 1e-9 * np.eye(d))
        xT = mu_T[None] + np.einsum(
            "ids,nis->nid", chol, rng.standard_normal((S, n, d)))
        Phi, Q = np.asarray(params.Phi), np.asarray(params.Q)
        w = np.einsum("ds,nis->nid", np.linalg.cholesky(Q),
                      rng.standard_normal((S, n, d)))
        x1 = xT @ Phi.T + w
        a, b = x1[..., 0], x1[..., 1]
        U, V = x1[..., 2:2 + r], x1[..., 2 + r:]
        y = (a[:, :, None] + b[:, None, :]
             + np.einsum("sir,sjr->sij", U, V)
             + np.sqrt(float(np.asarray(params.R)[0, 0]))
             * rng.standard_normal((S, n, n)))
        off = ~np.eye(n, dtype=bool)
        z = 1.6449  # 90% two-sided
        cov = compute_coverage(
            jnp.asarray(np.broadcast_to(m0, y.shape)[:, off]),
            jnp.asarray(np.broadcast_to(m0 - z * s0, y.shape)[:, off]),
            jnp.asarray(np.broadcast_to(m0 + z * s0, y.shape)[:, off]),
            jnp.asarray(y[:, off]))
        assert 0.84 < cov < 0.96


class TestMaskedSmoothed:
    """Missing-data support on the smoothed (joint-trajectory) engine —
    same mask surface as the CAVI engines."""

    def _setup(self, n=10, T=5, r=1, seed=6):
        model = TemporalAMEModel(n_nodes=n, n_time=T, latent_dim=r,
                                 seed=seed)
        model.generate_data()
        return model

    def test_full_mask_matches_unmasked(self):
        from tame.inference.smoothed import (
            fit_cavi_smoothed, init_smoothed_state)

        model = self._setup()
        Y = jnp.asarray(model.Y)
        init = init_smoothed_state(jax.random.PRNGKey(1), 10, 5, 4, 0.1)
        full = (1.0 - jnp.eye(10))[:, :, None] * jnp.ones((10, 10, 5))
        kw = dict(max_iter=30, learning_rate=0.8, tolerance=0.0,
                  fused=False)
        a = fit_cavi_smoothed(Y, model.params, init, **kw)
        b = fit_cavi_smoothed(Y, model.params, init, mask=full, **kw)
        assert np.allclose(np.asarray(a.state.X_mean),
                           np.asarray(b.state.X_mean), atol=1e-4)
        ea = np.asarray(a.elbo_history)[:30]
        eb = np.asarray(b.elbo_history)[:30]
        assert np.max(np.abs((ea - eb) / ea)) < 1e-4

    def test_masked_entries_never_read(self):
        from tame.inference.smoothed import (
            fit_cavi_smoothed, init_smoothed_state)
        from tame.models import random_dyad_mask

        model = self._setup()
        Y = jnp.asarray(model.Y)
        mask = random_dyad_mask(jax.random.PRNGKey(3), 10, 5, 0.3)
        Yg = jnp.where(mask[..., None] == 0, 1e6, Y)
        init = init_smoothed_state(jax.random.PRNGKey(1), 10, 5, 4, 0.1)
        kw = dict(max_iter=25, learning_rate=0.8, tolerance=0.0,
                  fused=False)
        c = fit_cavi_smoothed(Y, model.params, init, mask=mask, **kw)
        d = fit_cavi_smoothed(Yg, model.params, init, mask=mask, **kw)
        assert np.array_equal(np.asarray(c.state.X_mean),
                              np.asarray(d.state.X_mean))

    def test_masked_engine_improves(self):
        from tame.inference import TemporalAMESmoothedVI
        from tame.models import random_dyad_mask

        model = self._setup()
        mask = random_dyad_mask(jax.random.PRNGKey(2), 10, 5, 0.25)
        vi = TemporalAMESmoothedVI(model, mask=mask)
        h = vi.fit(max_iter=30, tolerance=0.0, verbose=False)
        assert np.isfinite(h["elbo"]).all()
        assert h["reconstruction_error"][-1] < h["reconstruction_error"][0]


class TestNaNCodedMissing:
    """NaN is the common real-data encoding for missing entries; with a
    matching mask the fits must be identical to zero-coded missing (the
    mask gates reads with jnp.where, never multiplication)."""

    @pytest.mark.slow
    def test_nan_coded_cavi(self):
        from tame.models import random_dyad_mask

        model = TemporalAMEModel(n_nodes=10, n_time=4, latent_dim=1,
                                 seed=8)
        Y, _ = model.generate_data(return_latents=True)
        Y = jnp.asarray(Y)
        mask = random_dyad_mask(jax.random.PRNGKey(1), 10, 4, 0.3)
        Ynan = jnp.where(mask[..., None] == 0, jnp.nan, Y)
        init = cavi.init_state(jax.random.PRNGKey(2), 10, 4, 4, "full",
                               0.1, 0.5)
        kw = dict(structure="full", update_mode="jacobi", max_iter=25,
                  learning_rate=0.7, tolerance=0.0)
        a = cavi.fit_cavi(Y, model.params, init, mask=mask, **kw)
        b = cavi.fit_cavi(Ynan, model.params, init, mask=mask, **kw)
        assert np.isfinite(np.asarray(b.elbo_history)[:25]).all()
        assert np.array_equal(np.asarray(a.X_mean), np.asarray(b.X_mean))

    @pytest.mark.slow
    def test_nan_coded_smoothed_and_em(self):
        from tame.config import ModelConfig
        from tame.inference import fit_em
        from tame.inference.smoothed import (
            fit_cavi_smoothed, init_smoothed_state)
        from tame.models import build_params, random_dyad_mask, sample

        cfg = ModelConfig(n_nodes=10, n_time=5, latent_dim=1, seed=4)
        params = build_params(cfg)
        Y, _ = sample(params, jax.random.PRNGKey(4), 10, 5)
        mask = random_dyad_mask(jax.random.PRNGKey(5), 10, 5, 0.3)
        Ynan = jnp.where(mask[..., None] == 0, jnp.nan, Y)
        init = init_smoothed_state(jax.random.PRNGKey(6), 10, 5, 4, 0.1)
        out = fit_cavi_smoothed(Ynan, params, init, max_iter=15,
                                learning_rate=0.5, tolerance=0.0,
                                mask=mask, fused=False)
        assert np.isfinite(np.asarray(out.elbo_history)[:15]).all()
        res = fit_em(Ynan, params, n_em=3, mask=mask)
        assert np.isfinite(res.history["elbo"]).all()
        assert np.isfinite(res.history["sigma2"][-1])


class TestPackedMask:
    """Int8 packed-mask contractions (tame.ops.masked_contract): masked
    fits read the 0/1 observation mask at 1 byte/entry through a Pallas
    kernel instead of streaming it as bf16/f32 — the lever that closes
    the masked-vs-dense per-iteration gap at scale.  Forced on (CPU
    interpret mode) via TAME_PACKED_MASK=1."""

    def _setup(self, n=12, T=4, r=2, seed=3):
        model = TemporalAMEModel(n_nodes=n, n_time=T, latent_dim=r,
                                 seed=seed)
        Y, _ = model.generate_data(return_latents=True)
        from tame.models import random_dyad_mask

        mask = random_dyad_mask(jax.random.PRNGKey(5), n, T, 0.35)
        init = cavi.init_state(jax.random.PRNGKey(0), n, T, 2 + 2 * r,
                               "full", 0.1, 0.5)
        return model, jnp.asarray(Y), mask, init

    def test_kernel_matches_einsum(self):
        from tame.ops.masked_contract import (
            pack_mask,
            packed_rows_contract,
        )

        rng = np.random.default_rng(0)
        n, T, K, nb = 20, 3, 5, 4
        mask = jnp.asarray((rng.random((n, n, T)) > 0.4)
                           .astype(np.float32))
        mask = mask * (1 - jnp.eye(n)[:, :, None])
        Z = jnp.asarray(rng.normal(size=(n, T, K)).astype(np.float32))
        pm = pack_mask(mask, nb)
        bs = n // nb
        got = jnp.concatenate(
            [packed_rows_contract(pm[k], Z, interpret=True)[:bs]
             for k in range(nb)], 0)
        Zb = Z.astype(jnp.bfloat16).astype(jnp.float32)
        ref = jnp.einsum("ijt,jtk->itk", mask, Zb)
        assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    @pytest.mark.slow
    @pytest.mark.parametrize("update_mode", ["jacobi", "block"])
    def test_packed_fit_matches_dense(self, update_mode, monkeypatch):
        """Packed-mask fits track the dense-mask fits within bf16
        feature quantization (the kernel's panels are bf16)."""
        model, Y, mask, init = self._setup()
        kw = dict(structure="full", update_mode=update_mode, max_iter=15,
                  learning_rate=0.6, tolerance=0.0, mask=mask,
                  corrected=True, diag_mode="stats")
        if update_mode == "block":
            kw["num_blocks"] = 4
        monkeypatch.setenv("TAME_PACKED_MASK", "0")
        a = cavi.fit_cavi(Y, model.params, init, **kw)
        monkeypatch.setenv("TAME_PACKED_MASK", "1")
        b = cavi.fit_cavi(Y, model.params, init, **kw)
        assert np.max(np.abs(np.asarray(a.X_mean)
                             - np.asarray(b.X_mean))) < 2e-2
        ea = np.asarray(a.elbo_history)[:15]
        eb = np.asarray(b.elbo_history)[:15]
        assert np.max(np.abs((ea - eb) / ea)) < 1e-2

    @pytest.mark.slow
    def test_packed_smoothed_converges_to_same_fixed_point(self,
                                                           monkeypatch):
        """The smoothed family amplifies per-step float noise
        pre-convergence (cf. the fused-kernel test), so the meaningful
        packed-vs-dense check is the converged fixed point."""
        from tame.inference.smoothed import (
            fit_cavi_smoothed,
            init_smoothed_state,
        )

        model, Y, mask, _ = self._setup()
        sinit = init_smoothed_state(jax.random.PRNGKey(1), 12, 4, 6, 0.1)
        kw = dict(max_iter=200, tolerance=0.0, mask=mask)
        monkeypatch.setenv("TAME_PACKED_MASK", "0")
        a = fit_cavi_smoothed(Y, model.params, sinit, **kw)
        monkeypatch.setenv("TAME_PACKED_MASK", "1")
        b = fit_cavi_smoothed(Y, model.params, sinit, **kw)
        assert np.max(np.abs(np.asarray(a.state.X_mean)
                             - np.asarray(b.state.X_mean))) < 5e-2
        ea = float(np.asarray(a.elbo_history)[199])
        eb = float(np.asarray(b.elbo_history)[199])
        assert abs(ea - eb) / abs(ea) < 1e-3

    @pytest.mark.slow
    def test_packed_never_reads_masked_entries(self, monkeypatch):
        """Garbage in hidden dyads must not change one bit of the packed
        fit (the mask packing reads the MASK, never Y)."""
        model, Y, mask, init = self._setup()
        monkeypatch.setenv("TAME_PACKED_MASK", "1")
        Yg = jnp.where(mask[..., None] == 0, 1e6, Y)
        kw = dict(structure="full", update_mode="jacobi", max_iter=10,
                  learning_rate=0.6, tolerance=0.0, mask=mask)
        a = cavi.fit_cavi(Y, model.params, init, **kw)
        b = cavi.fit_cavi(Yg, model.params, init, **kw)
        assert np.array_equal(np.asarray(a.X_mean), np.asarray(b.X_mean))


    def test_packed_smoothed_block_mode(self, monkeypatch):
        """Regression: packed masks must be packed with the BLOCK count
        when the smoothed fit uses block updates (was packed with 1
        block and raised at trace time)."""
        from tame.inference.smoothed import (
            fit_cavi_smoothed,
            init_smoothed_state,
        )

        model, Y, mask, _ = self._setup(n=12, T=4)
        sinit = init_smoothed_state(jax.random.PRNGKey(1), 12, 4, 6, 0.1)
        monkeypatch.setenv("TAME_PACKED_MASK", "1")
        out = fit_cavi_smoothed(Y, model.params, sinit, max_iter=5,
                                tolerance=0.0, mask=mask,
                                update_mode="block", num_blocks=4)
        assert np.isfinite(np.asarray(out.elbo_history)[:5]).all()


class TestSmoothedBlockUpdate:
    """Block Gauss-Seidel smoothed updates (smoothed_step_block): stable
    at lr ~ 1 where the simultaneous update oscillates at scale; same
    basin as jacobi on small problems (identified quantities agree)."""

    def _problem(self, n=12, T=5, r=2, seed=4):
        model = TemporalAMEModel(n_nodes=n, n_time=T, latent_dim=r,
                                 seed=seed)
        Y, _ = model.generate_data(return_latents=True)
        from tame.inference.smoothed import init_smoothed_state

        init = init_smoothed_state(jax.random.PRNGKey(0), n, T,
                                   2 + 2 * r, 0.1)
        return model, jnp.asarray(Y), init

    @pytest.mark.slow
    def test_block_matches_jacobi_identified(self):
        from tame.inference.smoothed import fit_cavi_smoothed
        from tame.ops import dyad as dyad_ops

        model, Y, init = self._problem()
        a = fit_cavi_smoothed(Y, model.params, init, max_iter=300,
                              tolerance=0.0, update_mode="jacobi")
        b = fit_cavi_smoothed(Y, model.params, init, max_iter=300,
                              tolerance=0.0, update_mode="block",
                              num_blocks=4)
        ea = float(np.asarray(a.elbo_history)[299])
        eb = float(np.asarray(b.elbo_history)[299])
        # block is at least as good an ascent (same family, fresher
        # coordinates per sweep)
        assert eb >= ea - 2.0
        mua = np.asarray(dyad_ops.dyadic_fwd_temporal(a.state.X_mean, 2))
        mub = np.asarray(dyad_ops.dyadic_fwd_temporal(b.state.X_mean, 2))
        off = ~np.eye(12, dtype=bool)
        assert np.max(np.abs(mua[off] - mub[off])) < 0.1
        ma = float(np.asarray(a.mse_history)[299])
        mb = float(np.asarray(b.mse_history)[299])
        assert abs(ma - mb) / ma < 0.02

    def test_block_lr1_converges(self):
        """lr = 1 block updates are exact coordinate ascent — they must
        converge (the tolerance rule fires) and improve the ELBO
        monotonically up to the plug-in likelihood's caveats."""
        from tame.inference.smoothed import fit_cavi_smoothed

        model, Y, init = self._problem()
        out = fit_cavi_smoothed(Y, model.params, init, max_iter=300,
                                tolerance=1e-5, learning_rate=1.0,
                                update_mode="block", num_blocks=4)
        assert bool(out.converged)
        eh = np.asarray(out.elbo_history)[:int(out.n_iter)]
        assert np.isfinite(eh).all()
        # monotone after the first few iterations
        assert np.all(np.diff(eh[5:]) > -1e-2)

    def test_masked_block(self):
        from tame.inference.smoothed import fit_cavi_smoothed
        from tame.models import random_dyad_mask

        model, Y, init = self._problem()
        mask = random_dyad_mask(jax.random.PRNGKey(2), 12, 5, 0.3)
        out = fit_cavi_smoothed(Y, model.params, init, max_iter=60,
                                tolerance=0.0, update_mode="block",
                                num_blocks=4, mask=mask,
                                diag_mode="stats")
        assert np.isfinite(np.asarray(out.elbo_history)[:60]).all()


class TestBernoulliCAVI:
    """JJ-bound CAVI for binary dynamic networks
    (tame/inference/binary_cavi.py): a variational engine for
    non-Gaussian dyads — the reference (and the Gaussian CAVI) has no
    counterpart; the gold standard it is validated against is the NUTS
    posterior on the same Bernoulli target."""

    def _data(self, n=14, T=4, seed=2):
        from tame.config import ModelConfig
        from tame.models import build_params, sample

        cfg = ModelConfig(n_nodes=n, n_time=T, latent_dim=1, seed=seed)
        p = build_params(cfg)
        Y, X = sample(p, jax.random.PRNGKey(seed), n, T,
                      family="bernoulli")
        init = cavi.init_state(jax.random.PRNGKey(1), n, T, 4, "full",
                               0.1, 0.5)
        return p, Y, X, init

    def test_bound_increases_and_recovers_truth(self):
        from tame.inference import fit_cavi_bernoulli
        from tame.ops import dyad as dyad_ops

        p, Y, X, init = self._data(n=24, T=6, seed=0)
        init = cavi.init_state(jax.random.PRNGKey(1), 24, 6, 4, "full",
                               0.1, 0.5)
        out = fit_cavi_bernoulli(Y, p, init, max_iter=150,
                                 learning_rate=0.8, tolerance=0.0)
        eh = np.asarray(out.elbo_history)[:150]
        assert np.isfinite(eh).all()
        # the JJ bound is a true lower bound maximized coordinate-wise:
        # monotone after the first damped transients
        assert np.all(np.diff(eh[3:]) > -1e-2)
        m_true = np.asarray(dyad_ops.dyadic_fwd_temporal(
            jnp.asarray(X), 1))
        m_est = np.asarray(dyad_ops.dyadic_fwd_temporal(out.X_mean, 1))
        off = ~np.eye(24, dtype=bool)
        corr = np.corrcoef(m_true[off].ravel(), m_est[off].ravel())[0, 1]
        assert corr > 0.7, corr
        assert float(np.asarray(out.accuracy_history)[149]) > 0.6

    @pytest.mark.slow
    def test_matches_nuts_posterior(self):
        """The variational log-odds surface must agree with the NUTS
        posterior mean of the SAME Bernoulli target (measured 0.99
        correlation at this config)."""
        from tame.inference import fit_cavi_bernoulli
        from tame.inference.logprob import make_logdensity_fn
        from tame.inference.nuts import run_nuts
        from tame.ops import dyad as dyad_ops

        p, Y, X, init = self._data()
        vi = fit_cavi_bernoulli(Y, p, init, max_iter=200,
                                learning_rate=0.8, tolerance=1e-5)
        m_vi = np.asarray(dyad_ops.dyadic_fwd_temporal(vi.X_mean, 1))
        fn = make_logdensity_fn(p, Y, family="bernoulli")
        out = jax.vmap(lambda pos, k: run_nuts(
            fn, pos, k, num_warmup=200, num_samples=200, max_depth=6))(
            0.1 * jax.random.normal(jax.random.PRNGKey(3),
                                    (2,) + X.shape),
            jax.random.split(jax.random.PRNGKey(4), 2))
        samples = jnp.asarray(out.positions).reshape((-1,) + X.shape)
        m_nuts = np.asarray(jnp.mean(jax.vmap(
            lambda Xs: dyad_ops.dyadic_fwd_temporal(Xs, 1))(samples), 0))
        off = ~np.eye(14, dtype=bool)
        corr = np.corrcoef(m_vi[off].ravel(), m_nuts[off].ravel())[0, 1]
        assert corr > 0.95, corr

    def test_masked_entries_never_read(self):
        from tame.inference import fit_cavi_bernoulli
        from tame.models import random_dyad_mask

        p, Y, X, init = self._data()
        mask = random_dyad_mask(jax.random.PRNGKey(5), 14, 4, 0.3)
        Yg = jnp.where(mask[..., None] == 0, jnp.nan, Y)
        kw = dict(max_iter=40, learning_rate=0.8, tolerance=0.0,
                  mask=mask)
        a = fit_cavi_bernoulli(Y, p, init, **kw)
        b = fit_cavi_bernoulli(Yg, p, init, **kw)
        assert np.array_equal(np.asarray(a.X_mean), np.asarray(b.X_mean))

    def test_warm_init_beats_random(self):
        """The logit-linearized warm start reaches a better bound
        under the same budget."""
        from tame.inference import TemporalAMEBernoulliVI
        from tame.models import sample_observations

        model = TemporalAMEModel(n_nodes=24, n_time=6, latent_dim=1,
                                 seed=0)
        model.generate_data(return_latents=True)
        model.Y = np.asarray(sample_observations(
            model.params, jax.random.PRNGKey(1), model.X,
            family="bernoulli"))
        w = TemporalAMEBernoulliVI(model, init_mode="warm")
        hw = w.fit(max_iter=40, tolerance=0.0, verbose=False)
        r = TemporalAMEBernoulliVI(model, init_mode="random")
        hr = r.fit(max_iter=40, tolerance=0.0, verbose=False)
        assert hw["elbo"][-1] >= hr["elbo"][-1] - 1.0
        assert hw["elbo"][5] > hr["elbo"][5]

    def test_segmented_checkpoint_resume(self, tmp_path):
        """Segmented in-fit checkpointing + kill-and-resume reproduce
        the uninterrupted binary fit BITWISE (cf. the CAVI/smoothed
        engines' guarantee; round-4 verdict flagged the binary engine
        as second-class here)."""
        from tame.inference import TemporalAMEBernoulliVI
        from tame.models import sample_observations

        model = TemporalAMEModel(n_nodes=10, n_time=4, latent_dim=1,
                                 seed=3)
        model.generate_data()
        model.Y = np.asarray(sample_observations(
            model.params, jax.random.PRNGKey(4), model.X,
            family="bernoulli"))
        a = TemporalAMEBernoulliVI(model, seed=3)
        ha = a.fit(max_iter=40, tolerance=1e-5, verbose=False)
        td = str(tmp_path / "ck")
        b = TemporalAMEBernoulliVI(model, seed=3)
        b.fit(max_iter=15, tolerance=1e-5, verbose=False,
              checkpoint_every=7, ckpt_dir=td)
        c = TemporalAMEBernoulliVI(model, seed=3)
        c.fit(max_iter=40, tolerance=1e-5, verbose=False,
              checkpoint_every=7, ckpt_dir=td, resume=True)
        assert c.history["elbo"] == ha["elbo"]
        assert np.array_equal(np.asarray(a.X_mean), np.asarray(c.X_mean))

    def test_engine_class(self):
        from tame.inference import TemporalAMEBernoulliVI
        from tame.models import sample_observations

        model = TemporalAMEModel(n_nodes=12, n_time=3, latent_dim=1,
                                 seed=7)
        model.generate_data(return_latents=True)
        model.Y = np.asarray(sample_observations(
            model.params, jax.random.PRNGKey(8), model.X,
            family="bernoulli"))
        vi = TemporalAMEBernoulliVI(model)
        h = vi.fit(max_iter=60, verbose=False)
        assert np.isfinite(h["elbo"]).all()
        proba = np.asarray(vi.predict_proba())
        assert np.all((proba >= 0) & (proba <= 1))
        # probabilities separate ties from non-ties
        y0 = np.asarray(model.Y)[..., 0]
        off = ~np.eye(12, dtype=bool)
        assert proba[off][y0[off] > 0.5].mean() \
            > proba[off][y0[off] < 0.5].mean() + 0.1


class TestPoissonCVI:
    """Conjugate-computation VI for count dynamic networks
    (tame/inference/poisson_cavi.py): the exact-ELBO CVI engine for
    Poisson dyads — the reference (and the Gaussian CAVI) has no
    counterpart; the gold standard it is validated against is the NUTS
    posterior on the same Poisson target."""

    def _data(self, n=14, T=4, seed=2):
        from tame.config import ModelConfig
        from tame.models import build_params, sample

        cfg = ModelConfig(n_nodes=n, n_time=T, latent_dim=1, seed=seed)
        p = build_params(cfg)
        Y, X = sample(p, jax.random.PRNGKey(seed), n, T,
                      family="poisson")
        init = cavi.init_state(jax.random.PRNGKey(1), n, T, 4, "full",
                               0.1, 0.5)
        return p, Y, X, init

    def test_elbo_increases_and_recovers_truth(self):
        from tame.inference import fit_cavi_poisson
        from tame.ops import dyad as dyad_ops

        p, Y, X, init = self._data(n=24, T=6, seed=0)
        init = cavi.init_state(jax.random.PRNGKey(1), 24, 6, 4, "full",
                               0.1, 0.5)
        out = fit_cavi_poisson(Y, p, init, max_iter=150,
                               learning_rate=0.7, tolerance=0.0)
        eh = np.asarray(out.elbo_history)[:150]
        assert np.isfinite(eh).all()
        # the guarded loop never records a slack-violating regression,
        # and this config accepts every step: monotone past transients
        assert np.all(np.diff(eh[5:]) > -1e-2)
        m_true = np.asarray(dyad_ops.dyadic_fwd_temporal(
            jnp.asarray(X), 1))
        m_est = np.asarray(dyad_ops.dyadic_fwd_temporal(out.X_mean, 1))
        off = ~np.eye(24, dtype=bool)
        corr = np.corrcoef(m_true[off].ravel(), m_est[off].ravel())[0, 1]
        assert corr > 0.8, corr

    def test_guard_rescues_jacobi_divergence(self):
        """Seeds on which the UNGUARDED damped CVI iteration provably
        diverges (measured: NaN by iteration ~5 at lr 0.7) must converge
        under the guarded loop."""
        from tame.inference import fit_cavi_poisson

        p, Y, X, init = self._data(n=14, T=4, seed=2)
        out = fit_cavi_poisson(Y, p, init, max_iter=500,
                               learning_rate=0.7, tolerance=1e-6)
        assert not bool(out.diverged)
        assert bool(out.converged)
        eh = np.asarray(out.elbo_history)[:int(out.n_iter)]
        assert np.isfinite(eh).all()

    @pytest.mark.slow
    def test_matches_nuts_posterior(self):
        """The variational log-rate surface must agree with the NUTS
        posterior mean of the SAME Poisson target."""
        from tame.inference import fit_cavi_poisson
        from tame.inference.logprob import make_logdensity_fn
        from tame.inference.nuts import run_nuts
        from tame.ops import dyad as dyad_ops

        p, Y, X, init = self._data()
        vi = fit_cavi_poisson(Y, p, init, max_iter=300,
                              learning_rate=0.7, tolerance=1e-5)
        m_vi = np.asarray(dyad_ops.dyadic_fwd_temporal(vi.X_mean, 1))
        fn = make_logdensity_fn(p, Y, family="poisson")
        out = jax.vmap(lambda pos, k: run_nuts(
            fn, pos, k, num_warmup=200, num_samples=200, max_depth=6))(
            0.1 * jax.random.normal(jax.random.PRNGKey(3),
                                    (2,) + X.shape),
            jax.random.split(jax.random.PRNGKey(4), 2))
        samples = jnp.asarray(out.positions).reshape((-1,) + X.shape)
        m_nuts = np.asarray(jnp.mean(jax.vmap(
            lambda Xs: dyad_ops.dyadic_fwd_temporal(Xs, 1))(samples), 0))
        off = ~np.eye(14, dtype=bool)
        corr = np.corrcoef(m_vi[off].ravel(), m_nuts[off].ravel())[0, 1]
        assert corr > 0.95, corr

    def test_masked_entries_never_read(self):
        from tame.inference import fit_cavi_poisson
        from tame.models import random_dyad_mask

        p, Y, X, init = self._data()
        mask = random_dyad_mask(jax.random.PRNGKey(5), 14, 4, 0.3)
        Yg = jnp.where(mask[..., None] == 0, jnp.nan, Y)
        kw = dict(max_iter=40, learning_rate=0.7, tolerance=0.0,
                  mask=mask)
        a = fit_cavi_poisson(Y, p, init, **kw)
        b = fit_cavi_poisson(Yg, p, init, **kw)
        assert np.array_equal(np.asarray(a.X_mean), np.asarray(b.X_mean))

    def test_warm_init_beats_random(self):
        """The log-link warm start reaches a better ELBO under the same
        budget."""
        from tame.inference import TemporalAMEPoissonVI
        from tame.models import sample_observations

        model = TemporalAMEModel(n_nodes=24, n_time=6, latent_dim=1,
                                 seed=0)
        model.generate_data(return_latents=True)
        model.Y = np.asarray(sample_observations(
            model.params, jax.random.PRNGKey(1), model.X,
            family="poisson"))
        w = TemporalAMEPoissonVI(model, init_mode="warm")
        hw = w.fit(max_iter=40, tolerance=0.0, verbose=False)
        r = TemporalAMEPoissonVI(model, init_mode="random")
        hr = r.fit(max_iter=40, tolerance=0.0, verbose=False)
        assert hw["elbo"][-1] >= hr["elbo"][-1] - 1.0
        assert hw["elbo"][5] > hr["elbo"][5]

    def test_segmented_checkpoint_resume(self, tmp_path):
        """The guarded loop's full carry (proposal + step scale) rides
        the checkpoint, so segmented/killed-and-resumed Poisson fits are
        BITWISE identical to uninterrupted ones."""
        from tame.inference import TemporalAMEPoissonVI
        from tame.models import sample_observations

        model = TemporalAMEModel(n_nodes=10, n_time=4, latent_dim=1,
                                 seed=3)
        model.generate_data()
        model.Y = np.asarray(sample_observations(
            model.params, jax.random.PRNGKey(4), model.X,
            family="poisson"))
        a = TemporalAMEPoissonVI(model, seed=3)
        ha = a.fit(max_iter=40, tolerance=1e-5, verbose=False)
        td = str(tmp_path / "ck")
        b = TemporalAMEPoissonVI(model, seed=3)
        b.fit(max_iter=15, tolerance=1e-5, verbose=False,
              checkpoint_every=7, ckpt_dir=td)
        c = TemporalAMEPoissonVI(model, seed=3)
        c.fit(max_iter=40, tolerance=1e-5, verbose=False,
              checkpoint_every=7, ckpt_dir=td, resume=True)
        assert c.history["elbo"] == ha["elbo"]
        assert np.array_equal(np.asarray(a.X_mean), np.asarray(c.X_mean))

    def test_engine_class(self):
        from tame.inference import TemporalAMEPoissonVI
        from tame.models import sample_observations

        model = TemporalAMEModel(n_nodes=12, n_time=3, latent_dim=1,
                                 seed=7)
        model.generate_data(return_latents=True)
        model.Y = np.asarray(sample_observations(
            model.params, jax.random.PRNGKey(8), model.X,
            family="poisson"))
        vi = TemporalAMEPoissonVI(model)
        h = vi.fit(max_iter=60, verbose=False)
        assert np.isfinite(h["elbo"]).all()
        rate = np.asarray(vi.predict_rate())
        assert np.all(rate >= 0)
        # posterior rates track the observed counts
        y0 = np.asarray(model.Y)[..., 0]
        off = ~np.eye(12, dtype=bool)
        corr = np.corrcoef(rate[off].ravel(), y0[off].ravel())[0, 1]
        assert corr > 0.5, corr


def test_poisson_family_nan_diag_gating():
    """Regression: a huge DIAGONAL predictor must not NaN the Poisson
    log-density (gated entries are sanitized before exp overflows)."""
    from tame.config import ModelConfig
    from tame.inference.logprob import make_logdensity_fn
    from tame.models import build_params, sample

    cfg = ModelConfig(n_nodes=6, n_time=2, latent_dim=1, seed=0)
    p = build_params(cfg)
    Y, X = sample(p, jax.random.PRNGKey(0), 6, 2, family="poisson")
    fn = make_logdensity_fn(p, Y, family="poisson")
    # blow up the self inner products: huge U, V for one node
    Xb = jnp.asarray(X).at[0, :, 2:].set(200.0)
    val = fn(Xb)
    assert not bool(jnp.isnan(val))


class TestWeightedUpdateGradientExactness:
    """The weighted engines' update direction must be the EXACT
    natural gradient: eta - P mu (observation + prior assembly) equals
    the autodiff gradient of the engine's own objective with respect to
    the means.  Pins the second-order partner-covariance terms of
    weighted_obs_terms (round-5 fix: omitting them turned the update
    into a descent direction on heavy-tailed count data) and, for the
    JJ bound, the envelope property at the xi-optimal point."""

    def _state(self, n=10, T=3, r=1, seed=0):
        key = jax.random.PRNGKey(seed)
        X_mean = 0.3 * jax.random.normal(key, (n, T, 2 + 2 * r))
        A = 0.2 * jax.random.normal(jax.random.fold_in(key, 1),
                                    (n, T, 2 + 2 * r, 2 + 2 * r))
        X_cov = jnp.einsum("ntab,ntcb->ntac", A, A) \
            + 0.3 * jnp.eye(2 + 2 * r)
        return cavi.CaviState(X_mean=X_mean, X_cov=X_cov)

    def test_poisson_gradient_matches_autodiff(self):
        from tame.config import ModelConfig
        from tame.inference import poisson_cavi as pc
        from tame.inference.binary_cavi import weighted_obs_terms
        from tame.models import build_params, sample
        from tame.ops import dyad as dyad_ops

        n, T, r = 10, 3, 1
        p = build_params(ModelConfig(n_nodes=n, n_time=T, latent_dim=r,
                                     seed=0))
        Y, _ = sample(p, jax.random.PRNGKey(0), n, T, family="poisson")
        st = self._state(n, T, r)
        offd = jnp.broadcast_to(dyad_ops.offdiag_mask(n)[:, :, None],
                                (n, n, T))
        y0 = jnp.where(offd > 0, Y[..., 0], 0.0)
        logyfac = jax.lax.lgamma(y0 + 1.0)
        pri = cavi.precompute_priors(p)

        g = jax.grad(lambda mu: pc._evaluate(
            cavi.CaviState(mu, st.X_cov), y0, logyfac, offd, pri,
            p)[0])(st.X_mean)

        _, _, m, var = pc._evaluate(st, y0, logyfac, offd, pri, p)
        w = jnp.exp(jnp.clip(m + 0.5 * var, -20.0, 20.0)) * offd
        resid = (y0 - w + w * m) * offd
        P, eta = weighted_obs_terms(st.X_mean, r, w, resid,
                                    cov=st.X_cov)
        P = P + cavi._prior_precision(pri, T)[None]
        eta = eta + cavi._prior_nat_param(pri, st.X_mean)
        implied = eta - jnp.einsum("ntab,ntb->nta", P, st.X_mean)
        scale = float(jnp.abs(g).max())
        assert float(jnp.abs(implied - g).max()) < 1e-4 * scale + 1e-4

    def test_bernoulli_gradient_matches_autodiff(self):
        from tame.config import ModelConfig
        from tame.inference import binary_cavi as bc
        from tame.models import build_params, sample
        from tame.ops import dyad as dyad_ops

        n, T, r = 10, 3, 1
        p = build_params(ModelConfig(n_nodes=n, n_time=T, latent_dim=r,
                                     seed=1))
        Y, _ = sample(p, jax.random.PRNGKey(1), n, T,
                      family="bernoulli")
        st = self._state(n, T, r, seed=1)
        offd = jnp.broadcast_to(dyad_ops.offdiag_mask(n)[:, :, None],
                                (n, n, T))
        y0 = jnp.where(offd > 0, Y[..., 0], 0.0)
        pri = cavi.precompute_priors(p)

        def bound_of(mu):
            state = cavi.CaviState(mu, st.X_cov)
            m, var = bc._predictor_moments(state, r)
            Em2 = m * m + var
            xi = jnp.sqrt(jnp.maximum(Em2, 1e-12))
            lam = bc._lam(xi) * offd
            resid = (y0 - 0.5) * offd
            b = jnp.sum(offd * (resid * m - lam * Em2 + xi / 2.0
                                - jax.nn.softplus(xi) + lam * xi * xi))
            p0, pt = cavi.state_prior_terms(p, pri, state)
            return b + p0 + pt + cavi.gaussian_entropy(state)

        g = jax.grad(bound_of)(st.X_mean)

        m, var = bc._predictor_moments(st, r)
        xi = jnp.sqrt(jnp.maximum(m * m + var, 1e-12))
        lam = bc._lam(xi) * offd
        resid = (y0 - 0.5) * offd
        P, eta = bc.weighted_obs_terms(st.X_mean, r, 2.0 * lam, resid,
                                       cov=st.X_cov)
        P = P + cavi._prior_precision(pri, T)[None]
        eta = eta + cavi._prior_nat_param(pri, st.X_mean)
        implied = eta - jnp.einsum("ntab,ntb->nta", P, st.X_mean)
        # autodiff differentiates THROUGH the xi map; at the xi-optimal
        # point the envelope theorem makes that extra path vanish, so
        # the fixed-xi assembly must match it
        scale = float(jnp.abs(g).max())
        assert float(jnp.abs(implied - g).max()) < 1e-4 * scale + 1e-4


def test_nongaussian_forecast_surface():
    """predict_forward / predict_{proba,rate}_forward on the binary and
    Poisson engine classes: AR(1) propagation pulls the forecast toward
    the prior mean (|Phi| < 1), probabilities/rates stay valid."""
    from tame.inference import (
        TemporalAMEBernoulliVI,
        TemporalAMEPoissonVI,
    )
    from tame.models import sample_observations

    model = TemporalAMEModel(n_nodes=10, n_time=4, latent_dim=1, seed=0)
    model.generate_data(return_latents=True)
    for fam, cls in [("bernoulli", TemporalAMEBernoulliVI),
                     ("poisson", TemporalAMEPoissonVI)]:
        model.Y = np.asarray(sample_observations(
            model.params, jax.random.PRNGKey(1), model.X, family=fam))
        vi = cls(model)
        vi.fit(max_iter=40, verbose=False)
        Xf = np.asarray(vi.predict_forward(3))
        assert Xf.shape == (10, 3, 4)
        # contraction toward zero under phi < 1
        assert np.linalg.norm(Xf[:, 2]) < np.linalg.norm(Xf[:, 0]) + 1e-6
        if fam == "bernoulli":
            pf = np.asarray(vi.predict_proba_forward(3))
            assert pf.shape == (10, 10, 3)
            assert np.all((pf >= 0) & (pf <= 1))
        else:
            rf = np.asarray(vi.predict_rate_forward(3))
            assert rf.shape == (10, 10, 3)
            assert np.all(rf >= 0)
