"""Bundled real datasets.

The reference ships no data at all — every experiment is synthetic
(`/root/reference/demo.py:37-56`).  This module bundles one classic
real social network so the full real-data pipeline (edge list ->
masked fit -> held-out evaluation -> substantive interpretation) runs
against genuinely observed ties with a known ground truth:

**Zachary's karate club** (Zachary, W. W., 1977, "An Information Flow
Model for Conflict and Fission in Small Groups", Journal of
Anthropological Research 33, 452-473): 34 members of a university
karate club, observed over ~2 years around the club's fission into two
factions ("Mr. Hi" vs "Officer").  The edge weights are COUNTS — the
number of distinct social contexts in which two members interacted —
which makes the network a natural target for the Poisson dyadic engine
(``tame.inference.TemporalAMEPoissonVI``).  The data checked into
``data/karate.csv`` / ``data/karate_factions.csv`` is exported verbatim
from ``networkx.karate_club_graph()`` (networkx 3.6.1), which encodes
Zachary's published weighted sociomatrix; the faction labels are the
observed post-split memberships — a real, external ground truth the
fitted latent space can be validated against (see
``docs/COOKBOOK.md`` §"Real data" and
``tests/test_io.py::TestKarateClub``: the top principal direction of
the fitted multiplicative effects separates the factions at ~94%).

The network is undirected (interaction counts are symmetric); in the
directed AME parameterization both directions of each dyad carry the
same count, and the model is free to learn a ~symmetric representation
(U ~ V) — no information is fabricated.
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import NamedTuple

import numpy as np

_DATA_DIR = Path(__file__).resolve().parents[2] / "data"


class KarateClub(NamedTuple):
    Y: np.ndarray          # (34, 34, 1, 2) reciprocal count tensor
    factions: np.ndarray   # (34,) bool: True = "Mr. Hi", False = "Officer"
    n_nodes: int


def load_karate_club(data_dir=None) -> KarateClub:
    """Load the bundled Zachary karate-club network as the framework's
    dyad tensor.

    Absent dyads are genuine ZERO counts (the club roster is complete:
    every pair was observed, most pairs interacted in no context), so
    the full off-diagonal is observed — build a held-out mask with
    :func:`tame.models.random_dyad_mask` for link-prediction
    evaluation.
    """
    d = Path(data_dir) if data_dir is not None else _DATA_DIR
    obs = {}
    with open(d / "karate.csv") as f:
        for row in csv.DictReader(f):
            obs[(int(row["sender"]), int(row["receiver"]))] = \
                float(row["weight"])
    n = 1 + max(max(i, j) for i, j in obs)
    Y = np.zeros((n, n, 1, 2), np.float32)
    for i in range(n):
        for j in range(n):
            if i != j:
                Y[i, j, 0, 0] = obs.get((i, j), 0.0)
                Y[i, j, 0, 1] = obs.get((j, i), 0.0)
    factions = np.zeros(n, bool)
    with open(d / "karate_factions.csv") as f:
        for row in csv.DictReader(f):
            factions[int(row["node"])] = row["club"] == "Mr. Hi"
    return KarateClub(Y=Y, factions=factions, n_nodes=n)
