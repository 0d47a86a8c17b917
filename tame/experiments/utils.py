"""Experiment harness utilities: result dirs, persistence, timing, reports.

Functional parity with the reference's ``experiments/utils.py``: timestamped
``results/<name>_<ts>/{figures,data}`` trees, pickle + JSON persistence, a
timed method runner producing the standard results dict (the lingua franca
consumed by ``compare_methods`` and the comparison plots), markdown report
generation and header printing.  ``set_random_seeds`` exists for surface
compatibility but randomness in this framework flows through explicit
``jax.random`` keys (the reference's global seeding is broken upstream,
SURVEY.md §2C-1).
"""

from __future__ import annotations

import json
import pickle
import time
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


def setup_experiment_dir(experiment_name: str,
                         base_dir: str = "results") -> Path:
    """Create ``<base>/<name>_<timestamp>/{figures,data}``
    (reference ``utils.py:36-69``)."""
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    exp_dir = Path(base_dir) / f"{experiment_name}_{timestamp}"
    exp_dir.mkdir(parents=True, exist_ok=True)
    (exp_dir / "figures").mkdir(exist_ok=True)
    (exp_dir / "data").mkdir(exist_ok=True)
    return exp_dir


def _convert_to_json_serializable(obj: Any) -> Any:
    """Strip arrays; keep scalars/strings/containers
    (reference ``utils.py:341-356``)."""
    if isinstance(obj, dict):
        return {k: _convert_to_json_serializable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_convert_to_json_serializable(v) for v in obj]
    if isinstance(obj, (np.ndarray, jax.Array)):
        return None
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if isinstance(obj, (int, float, str, bool, type(None))):
        return obj
    return str(obj)


def save_results(results: Dict[str, Any], exp_dir: Path,
                 filename: str = "results.pkl") -> None:
    """Pickle full results + JSON summary with arrays stripped
    (reference ``utils.py:72-114``).  Arrays are converted to numpy before
    pickling so results load without a device runtime."""

    def _to_host(obj):
        if isinstance(obj, dict):
            return {k: _to_host(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return type(obj)(_to_host(v) for v in obj)
        if isinstance(obj, jax.Array):
            return np.asarray(obj)
        return obj

    pkl_path = exp_dir / "data" / filename
    with open(pkl_path, "wb") as f:
        pickle.dump(_to_host(results), f)
    print(f"Results saved to: {pkl_path}")

    try:
        json_results = _convert_to_json_serializable(results)
        json_path = exp_dir / "data" / filename.replace(".pkl", ".json")
        with open(json_path, "w") as f:
            json.dump(json_results, f, indent=2)
        print(f"JSON summary saved to: {json_path}")
    except Exception as e:  # noqa: BLE001 — mirror reference's fallback
        print(f"Could not save JSON summary: {e}")


def load_results(exp_dir: Path, filename: str = "results.pkl"
                 ) -> Dict[str, Any]:
    """Load a pickled results dict (reference ``utils.py:117-143``)."""
    with open(Path(exp_dir) / "data" / filename, "rb") as f:
        return pickle.load(f)


def run_method_with_timing(vi_class, model, method_name: str,
                           max_iter: int = 100, verbose: bool = True,
                           **vi_kwargs) -> Dict[str, Any]:
    """Instantiate + fit a VI engine with wall-clock timing; returns the
    standard results dict ``{vi, history, X_est, runtime, iterations,
    method_name}`` (reference ``utils.py:146-229``)."""
    if verbose:
        print(f"\n{'=' * 70}")
        print(f"Running: {method_name}")
        print(f"{'=' * 70}")

    vi = vi_class(model, **vi_kwargs)
    start = time.time()
    history = vi.fit(max_iter=max_iter, verbose=verbose)
    runtime = time.time() - start

    X_est = getattr(vi, "X_mean", None)
    if X_est is None and hasattr(vi, "get_variational_means"):
        X_est = vi.get_variational_means()

    result = {
        "vi": vi,
        "history": history,
        "X_est": X_est,
        "runtime": runtime,
        "iterations": len(history.get("elbo", [])) or max_iter,
        "method_name": method_name,
    }
    if verbose:
        print(f"\nCompleted in {runtime:.2f} seconds")
        if history.get("reconstruction_error"):
            print(f"Final MSE: {history['reconstruction_error'][-1]:.6f}")
    return result


def generate_experiment_report(results: Dict[str, Dict[str, Any]],
                               exp_dir: Path,
                               X_true=None,
                               experiment_name: str = "Experiment",
                               latent_dim: int = 2) -> None:
    """Markdown report: summary table, rankings, improvements, parameter
    recovery, figure listing (reference ``utils.py:232-339``)."""
    report_path = Path(exp_dir) / "report.md"
    with open(report_path, "w") as f:
        f.write(f"# {experiment_name} Report\n\n")
        f.write(f"**Generated:** "
                f"{datetime.now().strftime('%Y-%m-%d %H:%M:%S')}\n\n")
        f.write(f"**Output Directory:** `{exp_dir}`\n\n")

        f.write("## Summary\n\n")
        f.write("| Method | Final MSE | Runtime (s) | Iterations |\n")
        f.write("|--------|-----------|-------------|------------|\n")
        for name, result in results.items():
            history = result.get("history", {})
            mse = (history.get("reconstruction_error") or [0])[-1]
            f.write(f"| {name} | {mse:.6f} | "
                    f"{result.get('runtime', 0):.2f} | "
                    f"{result.get('iterations', 0)} |\n")

        ranked = sorted(
            ((name, (r.get("history", {}).get("reconstruction_error")
                     or [np.inf])[-1])
             for name, r in results.items()),
            key=lambda kv: kv[1])
        if ranked:
            f.write("\n## Rankings\n\n")
            f.write("### By Reconstruction Error (Best to Worst)\n\n")
            for rank, (name, mse) in enumerate(ranked, 1):
                f.write(f"{rank}. **{name}**: {mse:.6f}\n")
            if len(ranked) > 1:
                base_name, base_mse = ranked[-1]
                f.write(f"\n### Improvement over Baseline ({base_name})\n\n")
                for name, mse in ranked[:-1]:
                    f.write(f"- **{name}**: "
                            f"{(1 - mse / base_mse) * 100:+.1f}%\n")

        if X_true is not None:
            from tame.utils import compute_alignment_error

            f.write("\n## Parameter Recovery\n\n")
            f.write("| Method | Alignment Error |\n")
            f.write("|--------|----------------|\n")
            for name, result in results.items():
                if result.get("X_est") is not None:
                    error, _ = compute_alignment_error(
                        result["X_est"], X_true, latent_dim=latent_dim,
                        align=True)
                    f.write(f"| {name} | {error:.6f} |\n")

        f.write("\n## Figures\n\n")
        f.write("Generated figures can be found in the `figures/` "
                "subdirectory:\n\n")
        figures_dir = Path(exp_dir) / "figures"
        if figures_dir.exists():
            for fig_file in sorted(figures_dir.glob("*.png")):
                f.write(f"- `{fig_file.name}`\n")
        f.write("\n---\n\n*Report generated automatically by "
                "tame.experiments.utils*\n")
    print(f"\nExperiment report saved to: {report_path}")


def set_random_seeds(seed: int = 42) -> None:
    """Surface-compatibility shim (reference ``utils.py:359-372``): seeds
    numpy's global RNG for any host-side randomness.  Device randomness in
    this framework is keyed explicitly per model/engine."""
    np.random.seed(seed)


def print_experiment_header(experiment_name: str,
                            params: Dict[str, Any]) -> None:
    """Formatted experiment banner (reference ``utils.py:375-395``)."""
    print("\n" + "=" * 70)
    print(f"EXPERIMENT: {experiment_name}")
    print("=" * 70)
    print("\nParameters:")
    for key, value in params.items():
        print(f"  {key:20s}: {value}")
    print("=" * 70 + "\n")
