"""Real-data ingestion: longitudinal dyadic edge lists -> model tensors.

The reference operates on synthetic data only — there is no loader of any
kind (`/root/reference` contains no file reading beyond pickle results,
``experiments/utils.py:116-143``).  Real relational data ships as panels
of (sender, receiver, time, value) records; this module converts them to
the framework's ``Y (n, n, T, 2)`` reciprocal layout plus the dyad
observation ``mask (n, n, T)`` consumed by the masked CAVI/MCMC engines,
and back.

Conventions (matching ``src/models/temporal_ame.py:159-216``):
``Y[i, j, t] = [y_ij^t, y_ji^t]``, zero diagonal, reciprocity
``Y[i, j, t, 1] == Y[j, i, t, 0]``.  A dyad {i, j} at time t is observed
only when BOTH directions are present in the records (the model's
likelihood is over the bivariate dyad); directed records without their
reverse are dropped and reported.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def edgelist_to_tensors(senders: Sequence, receivers: Sequence,
                        times: Sequence, values: Sequence,
                        n_nodes: Optional[int] = None,
                        n_time: Optional[int] = None,
                        node_ids: Optional[Sequence] = None,
                        ) -> Tuple[np.ndarray, np.ndarray, Dict]:
    """Convert directed longitudinal records to ``(Y, mask, info)``.

    Parameters
    ----------
    senders, receivers : node labels (any hashable; mapped to indices in
        first-appearance order unless ``node_ids`` fixes the ordering).
    times : integer time indices in ``[0, n_time)``.
    values : the directed edge weight sender -> receiver at that time.
    n_nodes, n_time : optional sizes (inferred from the data otherwise).
    node_ids : optional explicit node ordering (defines the index map).

    Returns
    -------
    Y : float32 (n, n, T, 2) reciprocal dyad tensor; unobserved entries 0.
    mask : float32 (n, n, T) symmetric observation mask for
        ``fit_cavi(mask=...)`` / the engine classes.
    info : dict with ``index_of`` (label -> row), ``n_dropped_oneway``
        (directed records whose reverse direction was absent — excluded,
        the dyadic likelihood needs both), and ``n_duplicates`` (later
        records overwrite earlier ones).
    """
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    times = np.asarray(times, dtype=np.int64)
    values = np.asarray(values, dtype=np.float32)
    if not (len(senders) == len(receivers) == len(times) == len(values)):
        raise ValueError("senders/receivers/times/values lengths differ")

    if node_ids is None:
        labels = list(dict.fromkeys(
            list(senders.tolist()) + list(receivers.tolist())))
    else:
        labels = list(node_ids)
    index_of = {lab: i for i, lab in enumerate(labels)}
    n = n_nodes if n_nodes is not None else len(labels)
    if len(labels) > n:
        raise ValueError(f"{len(labels)} distinct nodes > n_nodes={n}")
    T = n_time if n_time is not None else (int(times.max()) + 1
                                           if len(times) else 0)
    if len(times) and (times.min() < 0 or times.max() >= T):
        raise ValueError(f"times outside [0, {T})")

    si = np.array([index_of[s] for s in senders.tolist()], dtype=np.int64)
    ri = np.array([index_of[r] for r in receivers.tolist()], dtype=np.int64)
    if np.any(si == ri):
        raise ValueError("self-loops are not part of the AME model")

    directed = np.zeros((n, n, T), dtype=np.float32)
    seen = np.zeros((n, n, T), dtype=bool)
    # Duplicate (sender, receiver, time) records: keep the LAST occurrence
    # explicitly (numpy fancy-index assignment ordering is unspecified for
    # repeated indices, so `directed[si, ri, times] = values` alone would
    # leave the winner implementation-defined).
    lin = (si * n + ri) * T + times
    _, first_of_reversed = np.unique(lin[::-1], return_index=True)
    keep = len(lin) - 1 - first_of_reversed  # last occurrence per key
    n_duplicates = len(lin) - len(keep)      # records overwritten
    directed[si[keep], ri[keep], times[keep]] = values[keep]
    seen[si[keep], ri[keep], times[keep]] = True

    both = seen & np.swapaxes(seen, 0, 1)
    n_dropped = int((seen & ~both).sum())
    Y = np.zeros((n, n, T, 2), dtype=np.float32)
    Y[..., 0] = np.where(both, directed, 0.0)
    Y[..., 1] = np.where(both, np.swapaxes(directed, 0, 1), 0.0)
    mask = both.astype(np.float32)
    return Y, mask, {"index_of": index_of,
                     "n_dropped_oneway": n_dropped,
                     "n_duplicates": n_duplicates}


def tensors_to_edgelist(Y: np.ndarray, mask: Optional[np.ndarray] = None
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                   np.ndarray]:
    """Inverse of :func:`edgelist_to_tensors`: emit directed records
    (senders, receivers, times, values) for every observed dyad direction.
    With no mask, every off-diagonal entry is emitted."""
    Y = np.asarray(Y)
    n, _, T, _ = Y.shape
    if mask is None:
        mask = 1.0 - np.eye(n, dtype=np.float32)[:, :, None]
        mask = np.broadcast_to(mask, (n, n, T))
    i, j, t = np.nonzero(np.asarray(mask) > 0)
    return i, j, t, Y[i, j, t, 0]


def load_edgelist_csv(path, *, sender_col: int = 0, receiver_col: int = 1,
                      time_col: int = 2, value_col: int = 3,
                      delimiter: str = ",", skip_header: int = 1,
                      **kwargs) -> Tuple[np.ndarray, np.ndarray, Dict]:
    """Read a CSV of directed records and convert via
    :func:`edgelist_to_tensors` (kwargs forwarded)."""
    rows = np.genfromtxt(path, delimiter=delimiter,
                         skip_header=skip_header, dtype=str)
    if rows.ndim == 1:
        rows = rows[None]
    return edgelist_to_tensors(
        rows[:, sender_col], rows[:, receiver_col],
        rows[:, time_col].astype(float).astype(int),
        rows[:, value_col].astype(float), **kwargs)
