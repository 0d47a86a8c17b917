"""Visualization tests: every plot function returns a Figure and saves.

Coverage model: reference ``tests/test_visualization.py`` — Agg backend,
call every plot function, assert a Figure returns, close it; save-to-tmp
checks; edge cases (empty history, single node/time, r != 2 ValueError).
"""

import matplotlib

matplotlib.use("Agg")

import jax
import matplotlib.pyplot as plt
import numpy as np
import pytest

pytestmark = pytest.mark.visualization
from matplotlib.figure import Figure

from tame.visualization import (
    plot_computational_efficiency,
    plot_contribution_breakdown,
    plot_convergence,
    plot_convergence_comparison,
    plot_latent_space,
    plot_latent_trajectory_2d,
    plot_method_comparison,
    plot_network,
    plot_network_evolution,
    plot_parameter_comparison,
    plot_parameter_recovery_grid,
    plot_prediction_horizon,
    plot_reconstruction_comparison,
    plot_residuals,
    plot_state_trajectories,
    plot_temporal_contributions,
    plot_three_way_comparison,
)


@pytest.fixture(autouse=True)
def _close_figures():
    yield
    plt.close("all")


@pytest.fixture
def comparison_results(mock_history, rng_key):
    """Mock multi-method results dict (reference
    ``test_visualization.py:215-237``)."""
    X = jax.random.normal(rng_key, (8, 5, 6))

    class _FakeVI:
        X_cov = np.tile(np.eye(6) * 0.5, (8, 5, 1, 1))

    return {
        "Naive MF": {"history": mock_history, "X_est": X,
                     "runtime": 1.2, "iterations": 5, "vi": _FakeVI()},
        "Good SMF": {"history": {
            "elbo": [-900.0, -800.0], "reconstruction_error": [0.4, 0.3]},
            "X_est": X + 0.1, "runtime": 0.8, "iterations": 2,
            "vi": _FakeVI()},
    }


class TestStaticPlots:
    def test_plot_convergence(self, mock_history, tmp_path):
        path = tmp_path / "conv.png"
        fig = plot_convergence(mock_history, save_path=str(path))
        assert isinstance(fig, Figure)
        assert path.exists()

    def test_plot_convergence_empty_history(self):
        fig = plot_convergence({"elbo": [], "reconstruction_error": []})
        assert isinstance(fig, Figure)

    def test_plot_network_static_and_temporal(self, static_data,
                                              temporal_data):
        assert isinstance(plot_network(static_data["Y"]), Figure)
        assert isinstance(
            plot_network(temporal_data["Y"], time_index=2), Figure)

    def test_plot_latent_space(self, static_data):
        fig = plot_latent_space(static_data["M"])
        assert isinstance(fig, Figure)

    def test_plot_latent_space_requires_r2(self):
        M = np.random.default_rng(0).normal(size=(10, 6))  # r=3
        with pytest.raises(ValueError):
            plot_latent_space(M)

    def test_plot_contribution_breakdown(self):
        fig = plot_contribution_breakdown(0.5, 0.3)
        assert isinstance(fig, Figure)
        fig2 = plot_contribution_breakdown(0.5, 0.0)  # inf ratio
        assert isinstance(fig2, Figure)

    def test_plot_parameter_comparison(self, rng_key):
        X = jax.random.normal(rng_key, (10, 6))
        assert isinstance(plot_parameter_comparison(X, X), Figure)

    def test_plot_residuals(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        assert isinstance(
            plot_residuals(jax.random.normal(k1, (10, 10, 2)),
                           jax.random.normal(k2, (10, 10, 2))), Figure)


class TestTemporalPlots:
    def test_plot_state_trajectories(self, temporal_data, tmp_path):
        path = tmp_path / "traj.png"
        fig = plot_state_trajectories(temporal_data["X"],
                                      save_path=str(path))
        assert isinstance(fig, Figure)
        assert path.exists()

    def test_plot_state_trajectories_single_node(self, temporal_data):
        fig = plot_state_trajectories(temporal_data["X"], node_indices=[0])
        assert isinstance(fig, Figure)

    def test_plot_temporal_contributions(self):
        add = np.linspace(1, 2, 10)
        mult = np.linspace(2, 1, 10)
        assert isinstance(plot_temporal_contributions(add, mult), Figure)

    def test_plot_trajectory_comparison(self, temporal_data):
        X = temporal_data["X"]
        from tame.visualization import plot_trajectory_comparison
        fig = plot_trajectory_comparison(X, X, node_index=1)
        assert isinstance(fig, Figure)

    def test_plot_network_evolution(self, temporal_data):
        fig = plot_network_evolution(temporal_data["Y"])
        assert isinstance(fig, Figure)
        fig2 = plot_network_evolution(temporal_data["Y"], time_indices=[0])
        assert isinstance(fig2, Figure)

    def test_plot_latent_trajectory_2d(self, temporal_data):
        M = temporal_data["X"][:, :, 2:]
        assert isinstance(plot_latent_trajectory_2d(M), Figure)
        assert isinstance(plot_latent_trajectory_2d(M, plot_type="V"),
                          Figure)

    def test_plot_latent_trajectory_2d_requires_r2(self):
        M = np.random.default_rng(0).normal(size=(5, 4, 2))  # r=1
        with pytest.raises(ValueError):
            plot_latent_trajectory_2d(M)
        M_ok = np.random.default_rng(0).normal(size=(5, 4, 4))
        with pytest.raises(ValueError):
            plot_latent_trajectory_2d(M_ok, plot_type="W")

    def test_plot_prediction_horizon(self):
        fig = plot_prediction_horizon({1: 0.1, 2: 0.2, 3: 0.35})
        assert isinstance(fig, Figure)


class TestComparisonPlots:
    def test_plot_method_comparison(self, comparison_results):
        fig = plot_method_comparison(comparison_results)
        assert isinstance(fig, Figure)

    def test_plot_convergence_comparison(self, comparison_results):
        assert isinstance(
            plot_convergence_comparison(comparison_results), Figure)
        assert isinstance(
            plot_convergence_comparison(comparison_results,
                                        metric="reconstruction_error"),
            Figure)

    def test_plot_reconstruction_comparison(self, comparison_results,
                                            tmp_path):
        path = tmp_path / "recon.png"
        fig = plot_reconstruction_comparison(comparison_results,
                                             save_path=str(path))
        assert isinstance(fig, Figure)
        assert path.exists()

    def test_plot_parameter_recovery_grid(self, comparison_results,
                                          rng_key):
        X_true = jax.random.normal(rng_key, (8, 5, 6))
        fig = plot_parameter_recovery_grid(X_true, comparison_results)
        assert isinstance(fig, Figure)

    def test_plot_computational_efficiency(self, comparison_results):
        fig = plot_computational_efficiency(comparison_results)
        assert isinstance(fig, Figure)

    def test_plot_three_way_comparison(self, comparison_results, rng_key,
                                       tmp_path):
        X_true = jax.random.normal(rng_key, (8, 5, 6))
        path = tmp_path / "threeway.png"
        fig = plot_three_way_comparison(comparison_results, X_true=X_true,
                                        save_path=str(path))
        assert isinstance(fig, Figure)
        assert path.exists()


class TestMCMCDiagnosticsPlot:
    """plot_chain_diagnostics — visual companion to the sampler
    convergence reports (no reference counterpart: it has no sampler)."""

    def test_returns_figure_and_saves(self, tmp_path):
        import numpy as np

        from tame.visualization import plot_chain_diagnostics

        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 60, 3, 2))
        ld = rng.normal(size=(4, 60))
        fig = plot_chain_diagnostics(x, ld,
                                     save_path=str(tmp_path / "d.png"))
        assert isinstance(fig, Figure)
        assert (tmp_path / "d.png").exists()
        plt.close(fig)

    def test_without_logdensities(self):
        import numpy as np

        from tame.visualization import plot_chain_diagnostics

        x = np.random.default_rng(1).normal(size=(2, 40, 4))
        fig = plot_chain_diagnostics(x)
        assert isinstance(fig, Figure)
        plt.close(fig)


class TestPCAProjection:
    """projection='pca' lifts the reference's r=2-only restriction on the
    latent-space plots (static.py:253-254, temporal.py:448-449)."""

    def test_latent_space_r3_pca(self):
        from tame.visualization import plot_latent_space

        M = np.random.default_rng(0).normal(size=(8, 6))  # r=3
        with pytest.raises(ValueError):
            plot_latent_space(M)
        fig = plot_latent_space(M, projection="pca")
        assert fig is not None
        # axis labels carry explained variance
        assert "PC1" in fig.axes[0].get_xlabel()
        plt.close(fig)

    def test_trajectory_r4_pca(self):
        from tame.visualization import plot_latent_trajectory_2d

        M = np.random.default_rng(1).normal(size=(6, 5, 8))  # r=4
        with pytest.raises(ValueError):
            plot_latent_trajectory_2d(M)
        fig = plot_latent_trajectory_2d(M, projection="pca")
        assert fig is not None
        plt.close(fig)

    def test_r2_unchanged(self):
        from tame.visualization import plot_latent_space

        M = np.random.default_rng(2).normal(size=(8, 4))  # r=2
        fig = plot_latent_space(M)
        assert "Dimension 1" in fig.axes[0].get_xlabel()
        plt.close(fig)


def test_plot_smc_diagnostics(tmp_path):
    """SMC run report (tame/visualization/mcmc.py): consumes the
    adaptive-schedule result fields (NaN-padded histories, n_stages)."""
    import jax

    from tame.inference import TemporalAMESMC
    from tame.models import TemporalAMEModel
    from tame.visualization import plot_smc_diagnostics

    model = TemporalAMEModel(n_nodes=5, n_time=2, latent_dim=1, seed=0)
    model.generate_data()
    smc = TemporalAMESMC(model, num_particles=32, num_stages=32,
                         num_moves=1, seed=0)
    result = smc.sample()
    out = tmp_path / "smc.png"
    fig = plot_smc_diagnostics(result, save_path=str(out))
    assert fig is not None
    assert out.exists()
    import matplotlib.pyplot as plt

    plt.close(fig)
