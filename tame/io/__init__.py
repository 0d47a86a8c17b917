"""IO subsystem: native tensor store, checkpoint/resume, orbax bridge."""

from tame.io.datasets import KarateClub, load_karate_club
from tame.io.edgelist import (
    edgelist_to_tensors,
    load_edgelist_csv,
    tensors_to_edgelist,
)
from tame.io.checkpoint import (
    load_checkpoint,
    load_orbax,
    save_checkpoint,
    save_orbax,
)

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "save_orbax",
    "load_orbax",
    "edgelist_to_tensors",
    "tensors_to_edgelist",
    "load_edgelist_csv",
    "KarateClub",
    "load_karate_club",
]
