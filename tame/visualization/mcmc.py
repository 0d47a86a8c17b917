"""MCMC chain-diagnostic plots.

New surface with no reference counterpart (the reference has no sampler,
SURVEY.md §2B): visual companions to
:func:`tame.utils.diagnostics.chain_diagnostics` — trace plots of the
worst-mixing parameters, rank histograms (uniform when chains mix), the
per-parameter ESS distribution, and the log-density trace.
Host-side matplotlib like the rest of ``tame.visualization``.
"""

from __future__ import annotations

from typing import Optional

import matplotlib.pyplot as plt
import numpy as np
from matplotlib.figure import Figure


def plot_chain_diagnostics(positions, logdensities=None, n_worst: int = 3,
                           figsize=(14, 8),
                           save_path: Optional[str] = None) -> Figure:
    """Four-panel convergence report for a ``(chains, draws, ...)`` stack.

    Panels: (1) traces of the ``n_worst`` parameters ranked by
    split-R-hat, chains overlaid; (2) rank histogram of the single worst
    parameter (flat == mixed); (3) histogram of per-parameter ESS;
    (4) per-chain log-density traces (when given).
    """
    from tame.utils.diagnostics import effective_sample_size, split_rhat

    pos = np.asarray(positions)
    C, N = pos.shape[:2]
    flat = pos.reshape(C, N, -1)
    P = flat.shape[-1]

    rhat = np.asarray(split_rhat(flat)).ravel()
    ess = np.asarray(effective_sample_size(flat)).ravel()
    worst = np.argsort(-rhat)[:min(n_worst, P)]

    fig, axes = plt.subplots(2, 2, figsize=figsize)
    fig.suptitle(
        f"Chain diagnostics: {C} chains x {N} draws, "
        f"max R-hat {rhat.max():.3f}, min ESS {ess.min():.0f}")

    ax = axes[0, 0]
    for p in worst:
        for c in range(C):
            ax.plot(flat[c, :, p], lw=0.6, alpha=0.7)
    ax.set_title(f"Traces of {len(worst)} worst-R-hat parameters")
    ax.set_xlabel("Draw")
    ax.grid(alpha=0.3)

    ax = axes[0, 1]
    p0 = int(worst[0])
    ranks = np.argsort(np.argsort(flat[:, :, p0].ravel())).reshape(C, N)
    # Shared bins over the FULL global rank range [0, C*N): per-chain
    # auto-ranged bins would render a stuck chain's concentrated ranks as
    # a deceptively flat histogram — exactly the pathology this panel
    # exists to expose.
    n_bins = min(20, N // 2)
    edges = np.linspace(0, C * N, n_bins + 1)
    for c in range(C):
        ax.hist(ranks[c], bins=edges, histtype="step", lw=1.2,
                label=f"chain {c}" if C <= 6 else None)
    ax.axhline(N / n_bins, color="k", ls="--", lw=0.8)
    ax.set_title(f"Rank histogram, worst parameter "
                 f"(R-hat {rhat[p0]:.3f})")
    if C <= 6:
        ax.legend(fontsize=7)
    ax.grid(alpha=0.3)

    ax = axes[1, 0]
    ax.hist(ess, bins=30, color="tab:blue", alpha=0.8)
    ax.axvline(C * N, color="k", ls="--", lw=0.8, label="chains x draws")
    ax.set_title("Per-parameter effective sample size")
    ax.set_xlabel("ESS")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)

    ax = axes[1, 1]
    if logdensities is not None:
        ld = np.asarray(logdensities)
        for c in range(C):
            ax.plot(ld[c], lw=0.8, alpha=0.8)
        ax.set_title("Log density per chain")
        ax.set_xlabel("Draw")
    else:
        ax.axis("off")
        ax.set_title("(no log densities provided)")
    ax.grid(alpha=0.3)

    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
    return fig
