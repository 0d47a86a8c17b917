"""Sensitivity analysis: sweep one model parameter x replicate seeds.

Mirrors the reference's ``experiments/sensitivity_analysis.py`` (Naive MF vs
Good SMF over a parameter grid, mean +/- std of final MSE and runtime,
errorbar/runtime/improvement plots, markdown report) with two deliberate
upgrades:

* replicate seeds actually work — the reference's constructor re-seeds
  torch to 42 so all "replicates" see identical data (SURVEY.md §2C-1);
  here each replicate gets its own PRNG key;
* replicates run as ONE compiled, vmapped batch per parameter value
  (``vmap`` over keys of data generation + init + fit), the natural
  data-parallel axis of the north star (BASELINE.json config 3).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import numpy as np

from tame.config import ModelConfig
from tame.experiments.utils import (
    print_experiment_header,
    save_results,
    setup_experiment_dir,
)
from tame.inference import cavi
from tame.models import build_params, sample

SWEEPABLE = ("n_nodes", "n_time", "ar_coefficient", "rho_dyadic",
             "missing_frac")
_METHODS = {"Naive MF": "diag", "Good SMF": "full"}


def _vmapped_fits(cfg: ModelConfig, structure: str, n_replicates: int,
                  max_iter: int, learning_rate: float, seed: int,
                  missing_frac: float = 0.0):
    """Generate data, initialize and fit ``n_replicates`` instances in one
    vmapped call.  Returns final per-replicate MSE (per-dyad normalization)
    and iteration counts.  ``missing_frac > 0`` hides that fraction of
    dyads per replicate (each replicate gets its own random mask) and
    fits on the rest — the missing-data sweep axis (no reference
    counterpart)."""
    params = build_params(cfg)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_replicates)

    def one(key):
        kd, ki, km = jax.random.split(key, 3)
        Y, _ = sample(params, kd, cfg.n_nodes, cfg.n_time)
        init = cavi.init_state(ki, cfg.n_nodes, cfg.n_time, cfg.d,
                               structure, 0.1, 0.5)
        mask = None
        if missing_frac:
            from tame.models import random_dyad_mask

            mask = random_dyad_mask(km, cfg.n_nodes, cfg.n_time,
                                    missing_frac)
        out = cavi.fit_cavi(Y, params, init, structure=structure,
                            update_mode="jacobi", max_iter=max_iter,
                            learning_rate=learning_rate, mask=mask)
        last = out.n_iter - 1
        return out.mse_history[last], out.n_iter

    mses, iters = jax.vmap(one)(keys)
    return np.asarray(mses), np.asarray(iters)


def run_sensitivity_analysis(
    parameter: str = "n_nodes",
    values: Optional[list] = None,
    base_params: Optional[dict] = None,
    max_iter: int = 150,
    learning_rate: float = 0.01,
    n_replicates: int = 3,
    seed: int = 42,
    save_outputs: bool = True,
):
    """Sweep ``parameter`` over ``values`` with ``n_replicates`` keyed
    replicates per value (reference ``sensitivity_analysis.py:41-349``).

    Returns ``(results, exp_dir)``; ``results['data'][value]`` holds
    per-method ``{'mse_mean','mse_std','mses','runtime','iterations'}``.
    """
    if parameter not in SWEEPABLE:
        raise ValueError(
            f"Unknown parameter '{parameter}'; choose from {SWEEPABLE}")
    if values is None:
        values = ([0.0, 0.1, 0.3, 0.5] if parameter == "missing_frac"
                  else [10, 15, 20, 25, 30])
    if base_params is None:
        base_params = {"n_nodes": 15, "n_time": 10, "latent_dim": 2,
                       "ar_coefficient": 0.8, "rho_dyadic": 0.5}

    print_experiment_header(f"Sensitivity Analysis: {parameter}", {
        **base_params, "varied_parameter": parameter,
        "parameter_values": values, "max_iter": max_iter,
        "n_replicates": n_replicates, "seed": seed})

    exp_dir = None
    if save_outputs:
        exp_dir = setup_experiment_dir(f"sensitivity_{parameter}")
        print(f"Results will be saved to: {exp_dir}\n")

    results = {"parameter": parameter, "values": list(values),
               "base_params": dict(base_params), "data": {}}

    for value in values:
        print("\n" + "=" * 70)
        print(f"{parameter.upper()} = {value}")
        print("=" * 70)
        model_kwargs = dict(base_params)
        model_kwargs.pop("missing_frac", None)
        missing_frac = float(base_params.get("missing_frac", 0.0))
        if parameter == "missing_frac":
            missing_frac = float(value)
        else:
            model_kwargs[parameter] = value
        cfg = ModelConfig(**model_kwargs, seed=seed)

        per_value = {}
        for method_name, structure in _METHODS.items():
            start = time.time()
            mses, iters = _vmapped_fits(
                cfg, structure, n_replicates, max_iter, learning_rate,
                seed + hash(parameter) % 1000,
                missing_frac=missing_frac)
            runtime = time.time() - start
            per_value[method_name] = {
                "mses": mses.tolist(),
                "mse_mean": float(mses.mean()),
                "mse_std": float(mses.std()),
                "runtime": runtime / n_replicates,
                "iterations": iters.tolist(),
            }
            print(f"  {method_name}: MSE = {mses.mean():.4f} "
                  f"+/- {mses.std():.4f}  "
                  f"({runtime / n_replicates:.2f} s/replicate, vmapped)")
        results["data"][value] = per_value

    if save_outputs:
        _plot_sensitivity(results, exp_dir)
        save_results(results, exp_dir)
        _generate_sensitivity_report(results, exp_dir)
    return results, exp_dir


def _plot_sensitivity(results: Dict, exp_dir) -> None:
    """Errorbar / runtime / improvement plots
    (reference ``sensitivity_analysis.py:209-339``)."""
    import matplotlib.pyplot as plt

    values = results["values"]
    figdir = exp_dir / "figures"

    fig, axes = plt.subplots(1, 3, figsize=(16, 5))
    for method, color in (("Naive MF", "tab:blue"), ("Good SMF", "tab:orange")):
        means = [results["data"][v][method]["mse_mean"] for v in values]
        stds = [results["data"][v][method]["mse_std"] for v in values]
        axes[0].errorbar(values, means, yerr=stds, marker="o", capsize=4,
                         label=method, color=color)
        runtimes = [results["data"][v][method]["runtime"] for v in values]
        axes[1].plot(values, runtimes, marker="s", label=method, color=color)
    axes[0].set_xlabel(results["parameter"])
    axes[0].set_ylabel("Final MSE")
    axes[0].set_title("Reconstruction error")
    axes[0].legend()
    axes[0].grid(alpha=0.3)
    axes[1].set_xlabel(results["parameter"])
    axes[1].set_ylabel("Runtime per replicate (s)")
    axes[1].set_title("Runtime")
    axes[1].legend()
    axes[1].grid(alpha=0.3)

    improvements = []
    for v in values:
        naive = results["data"][v]["Naive MF"]["mse_mean"]
        good = results["data"][v]["Good SMF"]["mse_mean"]
        improvements.append((1 - good / naive) * 100 if naive > 0 else 0.0)
    axes[2].bar([str(v) for v in values], improvements, color="tab:green",
                alpha=0.8)
    axes[2].axhline(0, color="gray", lw=1)
    axes[2].set_xlabel(results["parameter"])
    axes[2].set_ylabel("Good SMF improvement over Naive (%)")
    axes[2].set_title("Relative improvement")
    axes[2].grid(axis="y", alpha=0.3)

    fig.tight_layout()
    fig.savefig(figdir / "sensitivity.png", dpi=150, bbox_inches="tight")
    plt.close(fig)


def _generate_sensitivity_report(results: Dict, exp_dir) -> None:
    """Markdown report (reference ``sensitivity_analysis.py:352-406``)."""
    path = exp_dir / "report.md"
    with open(path, "w") as f:
        f.write(f"# Sensitivity Analysis: {results['parameter']}\n\n")
        f.write(f"Base parameters: `{results['base_params']}`\n\n")
        f.write("| Value | Naive MF MSE | Good SMF MSE | Improvement |\n")
        f.write("|-------|--------------|--------------|-------------|\n")
        for v in results["values"]:
            naive = results["data"][v]["Naive MF"]
            good = results["data"][v]["Good SMF"]
            imp = ((1 - good["mse_mean"] / naive["mse_mean"]) * 100
                   if naive["mse_mean"] > 0 else 0.0)
            f.write(f"| {v} | {naive['mse_mean']:.4f} +/- "
                    f"{naive['mse_std']:.4f} | {good['mse_mean']:.4f} +/- "
                    f"{good['mse_std']:.4f} | {imp:+.1f}% |\n")
        f.write("\nReplicates are vmapped over independent PRNG keys (one "
                "compiled batch per value).\n")
    print(f"Sensitivity report saved to: {path}")


if __name__ == "__main__":
    # Reference __main__ config (``sensitivity_analysis.py:409-418``) with a
    # working damping.
    run_sensitivity_analysis(
        parameter="n_nodes", values=[10, 15, 20, 25, 30],
        max_iter=150, learning_rate=0.7, n_replicates=3, seed=42)
