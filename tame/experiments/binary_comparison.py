"""Binary-network comparison: JJ-bound VI vs Gaussian engines on ties.

The reference supports only continuous Gaussian dyads — there is no
binary experiment to mirror (`/root/reference/experiments/` fits three
Gaussian engines; `/root/reference/demo.py:37-56` generates Gaussian
data).  This experiment is the framework's first-class binary surface:
it generates a binary dynamic network from the temporal-AME latents,
hides a fraction of dyads, and compares

* **Binary JJ-VI** — the dedicated Jaakkola-Jordan CAVI engine
  (:class:`tame.inference.TemporalAMEBernoulliVI`, warm init), the
  correct observation model;
* **Smoothed binary** — the joint-trajectory JJ E-step
  (:func:`tame.inference.fit_smoothed_family`), a strictly tighter
  temporal family;
* **Gaussian Good SMF** — the structured Gaussian engine applied to
  ±1-coded ties: the standard "pretend it's continuous" baseline a
  practitioner would otherwise reach for.

Scoreboard: held-out link-prediction accuracy and AUC on the hidden
dyads (every method produces a per-dyad score — tie probability for the
binary engines, the Gaussian predictor for the control), convergence
curves, and network-vs-probability heatmaps.  Results flow through the
standard harness (timestamped dirs, pickle + JSON, markdown report).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from tame.experiments.utils import (
    print_experiment_header,
    save_results,
    set_random_seeds,
    setup_experiment_dir,
)


def _auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Rank-based AUC (Mann-Whitney): P(score_pos > score_neg)."""
    pos = scores[labels > 0.5]
    neg = scores[labels < 0.5]
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    order = np.argsort(np.concatenate([neg, pos]), kind="mergesort")
    ranks = np.empty(len(order), dtype=np.float64)
    ranks[order] = np.arange(1, len(order) + 1)
    # average ties (exact for binary-ish score ties)
    allv = np.concatenate([neg, pos])
    for v in np.unique(allv):
        sel = allv == v
        if sel.sum() > 1:
            ranks[sel] = ranks[sel].mean()
    r_pos = ranks[len(neg):].sum()
    return float((r_pos - len(pos) * (len(pos) + 1) / 2)
                 / (len(pos) * len(neg)))


def run_binary_comparison(
    n_nodes: int = 30,
    n_time: int = 8,
    latent_dim: int = 1,
    ar_coefficient: float = 0.8,
    missing_frac: float = 0.2,
    max_iter: int = 200,
    seed: int = 42,
    save_outputs: bool = True,
    verbose: bool = True,
) -> tuple:
    """Run the binary comparison; returns ``(results, exp_dir)``.

    ``results`` maps method name to the standard results dict plus
    ``scores`` (per-dyad (n, n, T) link score), ``holdout_accuracy`` and
    ``holdout_auc``.
    """
    import time

    import jax
    import jax.numpy as jnp

    from tame.inference import (
        TemporalAMEBernoulliVI,
        TemporalAMEStructuredMFVI,
        fit_smoothed_family,
        warm_init_smoothed_family,
    )
    from tame.models import (
        TemporalAMEModel,
        random_dyad_mask,
        sample_observations,
    )
    from tame.ops import dyad as dyad_ops

    set_random_seeds(seed)
    print_experiment_header("Binary Comparison", {
        "n_nodes": n_nodes, "n_time": n_time, "latent_dim": latent_dim,
        "ar_coefficient": ar_coefficient, "missing_frac": missing_frac,
        "max_iter": max_iter, "seed": seed,
    })

    model = TemporalAMEModel(n_nodes=n_nodes, n_time=n_time,
                             latent_dim=latent_dim,
                             ar_coefficient=ar_coefficient, seed=seed)
    model.generate_data(return_latents=True)
    Yb = np.asarray(sample_observations(
        model.params, jax.random.PRNGKey(seed + 7), model.X,
        family="bernoulli"))
    model.Y = Yb
    mask = np.asarray(random_dyad_mask(jax.random.PRNGKey(seed + 1),
                                       n_nodes, n_time, missing_frac))
    off = 1.0 - np.eye(n_nodes)[:, :, None]
    held = off * (1.0 - mask)
    y0 = Yb[..., 0]

    def holdout_metrics(scores: np.ndarray) -> Dict[str, float]:
        sel = held > 0
        acc = float(((scores[sel] > 0.5) == (y0[sel] > 0.5)).mean())
        return {"holdout_accuracy": acc,
                "holdout_auc": _auc(scores[sel], y0[sel])}

    results: Dict[str, Dict] = {}

    # --- Binary JJ-VI (mean-field) ---------------------------------------
    t0 = time.time()
    vi = TemporalAMEBernoulliVI(model, init_mode="warm",
                                mask=jnp.asarray(mask))
    hist = vi.fit(max_iter=max_iter, verbose=False)
    proba = np.asarray(vi.predict_proba())
    results["Binary JJ-VI"] = {
        "vi": vi, "history": hist, "X_est": vi.X_mean,
        "runtime": time.time() - t0, "iterations": len(hist["elbo"]),
        "method_name": "Binary JJ-VI", "scores": proba,
        **holdout_metrics(proba)}

    # --- Smoothed binary (joint-trajectory JJ) ---------------------------
    t0 = time.time()
    init = warm_init_smoothed_family(jnp.asarray(Yb), model.params,
                                     "bernoulli",
                                     obs_mask=jnp.asarray(mask))
    sm = fit_smoothed_family(jnp.asarray(Yb), model.params, init,
                             family="bernoulli", max_iter=max_iter,
                             learning_rate=0.7, tolerance=1e-5,
                             mask=jnp.asarray(mask))
    k = int(sm.n_iter)
    m_sm = np.asarray(dyad_ops.dyadic_fwd_temporal(sm.state.X_mean,
                                                   latent_dim))
    proba_sm = 1.0 / (1.0 + np.exp(-m_sm))
    results["Smoothed binary"] = {
        "vi": None, "history": {
            "elbo": np.asarray(sm.elbo_history)[:k].tolist()},
        "X_est": sm.state.X_mean, "runtime": time.time() - t0,
        "iterations": k, "method_name": "Smoothed binary",
        "scores": proba_sm, **holdout_metrics(proba_sm)}

    # --- Gaussian Good SMF on +-1 coded ties (control) -------------------
    t0 = time.time()
    model_g = TemporalAMEModel(n_nodes=n_nodes, n_time=n_time,
                               latent_dim=latent_dim,
                               ar_coefficient=ar_coefficient, seed=seed)
    model_g.generate_data()
    model_g.Y = 2.0 * Yb - 1.0
    gvi = TemporalAMEStructuredMFVI(model_g, factorization="good",
                                    learning_rate=0.8, init_mode="warm",
                                    mask=jnp.asarray(mask))
    ghist = gvi.fit(max_iter=max_iter, verbose=False)
    m_g = np.asarray(dyad_ops.dyadic_fwd_temporal(gvi.X_mean,
                                                  latent_dim))
    # calibrate the Gaussian predictor to a probability via its sign
    proba_g = 1.0 / (1.0 + np.exp(-2.0 * m_g))
    results["Gaussian Good SMF"] = {
        "vi": gvi, "history": ghist, "X_est": gvi.X_mean,
        "runtime": time.time() - t0, "iterations": len(ghist["elbo"]),
        "method_name": "Gaussian Good SMF", "scores": proba_g,
        **holdout_metrics(proba_g)}

    if verbose:
        print(f"\n{'Method':24s} {'held-out acc':>12s} "
              f"{'held-out AUC':>12s} {'runtime':>9s}")
        for name, res in results.items():
            print(f"{name:24s} {res['holdout_accuracy']:12.4f} "
                  f"{res['holdout_auc']:12.4f} "
                  f"{res['runtime']:8.2f}s")

    exp_dir = None
    if save_outputs:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        exp_dir = setup_experiment_dir("binary_comparison")

        # convergence curves (objectives are on different scales — one
        # panel per method)
        fig, axes = plt.subplots(1, len(results),
                                 figsize=(5 * len(results), 4))
        for ax, (name, res) in zip(np.atleast_1d(axes), results.items()):
            ax.plot(res["history"]["elbo"])
            ax.set_title(name)
            ax.set_xlabel("iteration")
            ax.set_ylabel("objective")
        fig.tight_layout()
        fig.savefig(exp_dir / "figures" / "convergence.png", dpi=120)
        plt.close(fig)

        # observed adjacency vs predicted probabilities at t = T-1
        t = n_time - 1
        fig, axes = plt.subplots(1, 1 + len(results),
                                 figsize=(4 * (1 + len(results)), 4))
        axes[0].imshow(y0[:, :, t], cmap="Greys", vmin=0, vmax=1)
        axes[0].set_title(f"observed ties (t={t})")
        for ax, (name, res) in zip(axes[1:], results.items()):
            ax.imshow(res["scores"][:, :, t], cmap="viridis",
                      vmin=0, vmax=1)
            ax.set_title(name)
        fig.tight_layout()
        fig.savefig(exp_dir / "figures" / "adjacency_probabilities.png",
                    dpi=120)
        plt.close(fig)

        save_results({k: {kk: vv for kk, vv in v.items() if kk != "vi"}
                      for k, v in results.items()}, exp_dir)
        report = exp_dir / "report.md"
        with open(report, "w") as f:
            f.write("# Binary comparison\n\n")
            f.write(f"n={n_nodes}, T={n_time}, r={latent_dim}, "
                    f"phi={ar_coefficient}, missing={missing_frac:.0%}, "
                    f"seed={seed}\n\n")
            f.write("| method | held-out accuracy | held-out AUC | "
                    "runtime (s) | iterations |\n|---|---|---|---|---|\n")
            for name, res in results.items():
                f.write(f"| {name} | {res['holdout_accuracy']:.4f} | "
                        f"{res['holdout_auc']:.4f} | "
                        f"{res['runtime']:.2f} | "
                        f"{res['iterations']} |\n")
        if verbose:
            print(f"\nOutputs written to {exp_dir}")
    return results, exp_dir


if __name__ == "__main__":
    run_binary_comparison()
