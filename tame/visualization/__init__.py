"""Visualization: static, temporal and comparison plots.

Export surface mirrors the reference's ``src/visualization/__init__.py``
(18 plot functions + the correlation-panel helper).  Uses matplotlib on
host-gathered arrays — plotting is not device work.
"""

import matplotlib

# Headless-safe default; callers can switch backends before importing.
if matplotlib.get_backend().lower() not in ("agg",):
    try:
        matplotlib.use("Agg")
    except Exception:  # pragma: no cover
        pass

from tame.visualization.static import (
    plot_contribution_breakdown,
    plot_convergence,
    plot_latent_space,
    plot_network,
    plot_parameter_comparison,
    plot_residuals,
)
from tame.visualization.temporal import (
    plot_latent_trajectory_2d,
    plot_network_evolution,
    plot_prediction_horizon,
    plot_state_trajectories,
    plot_temporal_contributions,
    plot_trajectory_comparison,
)
from tame.visualization.mcmc import (
    plot_chain_diagnostics,
    plot_smc_diagnostics,
)
from tame.visualization.comparison import (
    add_correlation_panels_to_figure,
    plot_computational_efficiency,
    plot_convergence_comparison,
    plot_method_comparison,
    plot_parameter_recovery_grid,
    plot_reconstruction_comparison,
    plot_three_way_comparison,
)

__all__ = [
    "plot_chain_diagnostics",
    "plot_smc_diagnostics",
    "plot_convergence",
    "plot_network",
    "plot_latent_space",
    "plot_contribution_breakdown",
    "plot_parameter_comparison",
    "plot_residuals",
    "plot_state_trajectories",
    "plot_temporal_contributions",
    "plot_trajectory_comparison",
    "plot_network_evolution",
    "plot_latent_trajectory_2d",
    "plot_prediction_horizon",
    "plot_method_comparison",
    "plot_convergence_comparison",
    "plot_reconstruction_comparison",
    "plot_parameter_recovery_grid",
    "plot_computational_efficiency",
    "plot_three_way_comparison",
    "add_correlation_panels_to_figure",
]
