"""Checkpoint / resume for long-running fits and samplers.

The reference has no training checkpointing at all — state lives in memory
for the whole fit and only final results are pickled (reference
``experiments/utils.py:72-143``; a never-used ``checkpoints/*.pt`` entry in
its .gitignore).  At production scale (multi-host, n=2000+) checkpoint-based
restart is the failure-recovery story, so this is a first-class subsystem:

* native path — every array goes through the C++ tamestore
  (``tame/io/cstore.cpp``): streaming write, CRC32 integrity, no Python
  object serialization; metadata in a JSON manifest;
* fallback path — numpy ``.npy`` when no C++ toolchain exists;
* orbax path — ``save_orbax``/``load_orbax`` for multi-host async
  checkpointing of sharded arrays.

Checkpoints are atomic: written to ``<dir>.tmp`` then renamed.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np

from tame.io import native


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(_flatten(v, key + "/"))
        else:
            flat[key] = v
    return flat


def _unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_checkpoint(ckpt_dir: str | Path, state: Dict[str, Any]) -> Path:
    """Save a (possibly nested) dict of arrays and JSON-able scalars.

    Arrays land in per-tensor native store files (or ``.npy`` fallback);
    everything else goes into ``manifest.json``.  The write is atomic.
    """
    ckpt_dir = Path(ckpt_dir)
    tmp = ckpt_dir.with_suffix(".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)

    use_native = native.available()
    manifest = {"format": "tamestore" if use_native else "npy",
                "tensors": {}, "scalars": {}}
    for key, value in _flatten(state).items():
        if isinstance(value, (jax.Array, np.ndarray)):
            arr = np.asarray(value)
            fname = key.replace("/", "__") + (
                ".tame" if use_native else ".npy")
            if use_native:
                native.write_tensor(tmp / fname, arr)
            else:
                np.save(tmp / fname, arr)
            manifest["tensors"][key] = {
                "file": fname, "shape": list(arr.shape),
                "dtype": str(arr.dtype)}
        else:
            manifest["scalars"][key] = value
    with open(tmp / "manifest.json", "w") as f:
        json.dump(manifest, f, indent=2)

    if ckpt_dir.exists():
        shutil.rmtree(ckpt_dir)
    tmp.rename(ckpt_dir)
    return ckpt_dir


def load_checkpoint(ckpt_dir: str | Path) -> Dict[str, Any]:
    """Load a checkpoint written by :func:`save_checkpoint`."""
    ckpt_dir = Path(ckpt_dir)
    with open(ckpt_dir / "manifest.json") as f:
        manifest = json.load(f)
    flat: Dict[str, Any] = dict(manifest["scalars"])
    for key, meta in manifest["tensors"].items():
        path = ckpt_dir / meta["file"]
        if manifest["format"] == "tamestore":
            flat[key] = native.read_tensor(path)
        else:
            flat[key] = np.load(path)
    return _unflatten(flat)


# ---------------------------------------------------------------------------
# Orbax path (multi-host, sharded arrays)
# ---------------------------------------------------------------------------

def save_orbax(ckpt_dir: str | Path, state: Dict[str, Any]) -> None:
    """Checkpoint through orbax (handles sharded jax.Arrays across hosts)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(Path(ckpt_dir).absolute(), state, force=True)


def load_orbax(ckpt_dir: str | Path) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(ckpt_dir).absolute())
