"""Utils tests: alignment exactness, metric identities, diagnostics output.

Coverage model: reference ``tests/test_utils.py`` — Procrustes recovers a
known rotation, sign-flip recovery, alignment-improves-not-regresses,
RMSE = sqrt(MSE), R^2 = 1 at truth, corr(x, -x) = -1, masked metrics,
console output via capsys.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tame.utils import (
    align_latent_positions,
    align_signs,
    align_temporal_states,
    calibration_error,
    compare_methods,
    compute_alignment_error,
    compute_correlation_after_alignment,
    compute_coverage,
    compute_contribution_ratio,
    compute_elbo_gap,
    compute_reconstruction_error,
    compute_temporal_contributions,
    compute_uv_product_correlation,
    link_prediction_metrics,
    mean_absolute_error,
    mean_squared_error,
    pearson_correlation,
    print_diagnostic_summary,
    procrustes_alignment,
    r_squared,
    relative_error,
    root_mean_squared_error,
    temporal_consistency_score,
    temporal_prediction_metrics,
    track_convergence,
)


class TestAlignment:
    def test_procrustes_recovers_rotation(self, rng_key):
        """A known rotation must be exactly undone
        (reference ``test_utils.py:157-174``)."""
        X = jax.random.normal(rng_key, (20, 3))
        theta = 0.7
        R = jnp.array([[np.cos(theta), -np.sin(theta), 0],
                       [np.sin(theta), np.cos(theta), 0],
                       [0, 0, 1.0]])
        X_rot = X @ R
        X_aligned, _ = procrustes_alignment(X_rot, X)
        assert np.allclose(np.asarray(X_aligned), np.asarray(X), atol=1e-4)

    def test_procrustes_handles_reflection(self, rng_key):
        X = jax.random.normal(rng_key, (20, 2))
        X_ref = X * jnp.array([1.0, -1.0])  # reflection
        X_aligned, R = procrustes_alignment(X_ref, X)
        assert float(jnp.linalg.det(R)) > 0  # proper rotation enforced

    def test_procrustes_scaling(self, rng_key):
        X = jax.random.normal(rng_key, (20, 3))
        X_aligned, _ = procrustes_alignment(2.5 * X, X, scaling=True)
        assert np.allclose(np.asarray(X_aligned), np.asarray(X), atol=1e-3)

    def test_sign_flip_recovery(self, rng_key):
        """Flipped rows must be flipped back
        (reference ``test_utils.py:176-184``)."""
        X = jax.random.normal(rng_key, (10, 3))
        flips = jnp.array([1, -1] * 5)[:, None]
        X_aligned = align_signs(X * flips, X, dim=1)
        assert np.allclose(np.asarray(X_aligned), np.asarray(X))

    def test_align_latent_positions_improves(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        M_true = jax.random.normal(k1, (15, 4))
        theta = 0.5
        R = jnp.array([[np.cos(theta), -np.sin(theta)],
                       [np.sin(theta), np.cos(theta)]])
        M_est = jnp.concatenate([M_true[:, :2] @ R, M_true[:, 2:] @ R],
                                axis=1)
        M_aligned = align_latent_positions(M_est, M_true, latent_dim=2)
        err_before = float(jnp.mean((M_est - M_true) ** 2))
        err_after = float(jnp.mean((M_aligned - M_true) ** 2))
        assert err_after <= err_before + 1e-6
        assert err_after < 1e-6

    def test_temporal_alignment_shapes_and_improvement(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        X_true = jax.random.normal(k1, (10, 5, 6))
        noise = jax.random.normal(k2, (10, 5, 6)) * 0.01
        X_est = -(X_true + noise)  # global sign flip
        X_aligned = align_temporal_states(X_est, X_true, latent_dim=2)
        assert X_aligned.shape == X_true.shape
        err_before = float(jnp.mean((X_est - X_true) ** 2))
        err_after = float(jnp.mean((X_aligned - X_true) ** 2))
        assert err_after < err_before

    def test_global_alignment_mode(self, rng_key):
        X_true = jax.random.normal(rng_key, (10, 5, 6))
        X_aligned = align_temporal_states(X_true, X_true, latent_dim=2,
                                          align_each_time=False)
        err = float(jnp.mean((X_aligned - X_true) ** 2))
        assert err < 1e-6

    def test_compute_alignment_error_api(self, rng_key):
        X_true = jax.random.normal(rng_key, (8, 4, 6))
        err, X_aligned = compute_alignment_error(X_true, X_true,
                                                 latent_dim=2)
        assert err < 1e-8
        with pytest.raises(ValueError):
            compute_alignment_error(X_true, X_true, latent_dim=None)

    def test_correlation_after_alignment(self, rng_key):
        X_true = jax.random.normal(rng_key, (8, 4, 6))
        corr = compute_correlation_after_alignment(X_true, X_true,
                                                   latent_dim=2)
        assert corr > 0.999


class TestMetrics:
    def test_mse_identity(self):
        y = jnp.arange(10.0)
        assert mean_squared_error(y, y) == 0.0
        assert mean_squared_error(y, y + 1.0) == pytest.approx(1.0)

    def test_rmse_is_sqrt_mse(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        y1 = jax.random.normal(k1, (50,))
        y2 = jax.random.normal(k2, (50,))
        assert root_mean_squared_error(y1, y2) == pytest.approx(
            np.sqrt(mean_squared_error(y1, y2)), rel=1e-5)

    def test_r2_at_truth(self, rng_key):
        y = jax.random.normal(rng_key, (100,))
        assert r_squared(y, y) == pytest.approx(1.0)

    def test_pearson_anticorrelation(self, rng_key):
        y = jax.random.normal(rng_key, (100,))
        assert pearson_correlation(y, -y) == pytest.approx(-1.0, abs=1e-5)

    def test_masked_metrics(self):
        y_true = jnp.array([1.0, 2.0, 3.0, 4.0])
        y_pred = jnp.array([1.0, 2.0, 100.0, 4.0])
        mask = jnp.array([1.0, 1.0, 0.0, 1.0])
        assert mean_squared_error(y_true, y_pred, mask) == 0.0
        assert mean_absolute_error(y_true, y_pred, mask) == 0.0

    def test_temporal_consistency(self):
        X_const = jnp.ones((5, 10, 3))
        assert temporal_consistency_score(X_const) == 0.0
        X_rough = jnp.asarray(
            np.random.default_rng(0).normal(size=(5, 10, 3)))
        assert temporal_consistency_score(X_rough) > 0.0

    def test_link_prediction_perfect(self, rng_key):
        Y = jax.random.normal(rng_key, (10, 10))
        m = link_prediction_metrics(Y, Y)
        assert m["accuracy"] == pytest.approx(1.0)
        assert m["f1"] == pytest.approx(1.0)

    def test_coverage(self):
        targets = jnp.array([0.0, 0.5, 2.0, -3.0])
        lower = jnp.full(4, -1.0)
        upper = jnp.full(4, 1.0)
        cov = compute_coverage(targets, lower, upper, targets)
        assert cov == pytest.approx(0.5)

    def test_calibration_error_perfect(self):
        preds = np.zeros(100)
        targets = np.ones(100) * 0.5
        unc = np.ones(100) * 0.5  # predicted uncertainty == actual error
        assert calibration_error(preds, unc, targets) == pytest.approx(
            0.0, abs=1e-6)

    def test_temporal_prediction_metrics(self, rng_key):
        Y = jax.random.normal(rng_key, (6, 6, 4, 2))
        m = temporal_prediction_metrics(Y, Y, horizon=1)
        assert m["mse"] == pytest.approx(0.0)
        m_long = temporal_prediction_metrics(Y, Y, horizon=10)
        assert m_long["mse"] == float("inf")

    def test_relative_error(self):
        y = jnp.array([1.0, 2.0])
        assert relative_error(y, y) == pytest.approx(0.0)


class TestDiagnostics:
    def test_reconstruction_error_normalizations(self, rng_key):
        """Per-entry normalization (reference quirk: differs from the
        history's per-dyad normalization by 2x)."""
        Y = jax.random.normal(rng_key, (6, 6, 4, 2))
        Yp = jnp.zeros_like(Y)
        err = compute_reconstruction_error(Y, Yp)
        n = 6
        mask = ~np.eye(n, dtype=bool)
        expected = float((np.asarray(Y)[mask] ** 2).sum() / (n * (n - 1) * 4 * 2))
        assert err == pytest.approx(expected, rel=1e-5)

    def test_temporal_contributions(self, rng_key):
        X = jax.random.normal(rng_key, (8, 5, 6))
        add, mult = compute_temporal_contributions(X, latent_dim=2)
        assert add.shape == (5,)
        assert np.all(np.asarray(add) >= 0)

    def test_contribution_ratio_inf(self):
        A = jnp.ones((5, 2))
        M = jnp.zeros((5, 4))
        assert compute_contribution_ratio(A, M) == float("inf")

    def test_print_summary(self, mock_history, capsys):
        print_diagnostic_summary("Test Method", mock_history)
        out = capsys.readouterr().out
        assert "Test Method" in out
        assert "Final ELBO" in out
        assert "reconstruction MSE" in out

    def test_compare_methods_output(self, mock_history, capsys):
        results = {
            "A": {"history": mock_history},
            "B": {"history": {"elbo": [-1.0],
                              "reconstruction_error": [0.9]}},
        }
        compare_methods(results)
        out = capsys.readouterr().out
        assert "Method Comparison" in out
        assert "1. A" in out  # A has lower error -> rank 1

    def test_track_convergence(self):
        flat = {"elbo": [1.0] * 20}
        moving = {"elbo": list(range(20))}
        assert track_convergence(flat)["elbo"] is True
        assert track_convergence(moving)["elbo"] is False
        assert track_convergence({"elbo": [1.0]})["elbo"] is False

    def test_elbo_gap(self):
        assert compute_elbo_gap([-10.0, -5.0], -4.0) == pytest.approx(1.0)
        assert compute_elbo_gap([-10.0], None) is None
        assert compute_elbo_gap([], -4.0) is None

    def test_uv_product_correlation_identity(self, rng_key):
        M = jax.random.normal(rng_key, (10, 4))
        assert compute_uv_product_correlation(M, M, 2) == pytest.approx(
            1.0, abs=1e-5)


class TestProfiling:
    def test_benchmark(self):
        from tame.utils.profiling import benchmark
        import jax.numpy as jnp

        f = jax.jit(lambda x: x * 2.0)
        stats = benchmark(f, jnp.ones(8), warmup=1, repeats=2)
        assert stats["best_s"] > 0
        assert stats["repeats"] == 2

    def test_metrics_logger_roundtrip(self, tmp_path):
        from tame.utils.profiling import MetricsLogger, log_fit_history

        path = tmp_path / "metrics.jsonl"
        with MetricsLogger(path) as logger:
            logger.log(0, elbo=-100.0, mse=0.5)
            log_fit_history(logger, {"elbo": [-90.0, -80.0]}, start_step=1)
        records = MetricsLogger.read(path)
        assert len(records) == 3
        assert records[0]["elbo"] == -100.0
        assert records[2]["step"] == 2
        assert records[2]["elbo"] == -80.0
