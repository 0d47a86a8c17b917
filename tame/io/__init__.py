"""IO subsystem: native tensor store, checkpoint/resume, orbax bridge."""

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
]
