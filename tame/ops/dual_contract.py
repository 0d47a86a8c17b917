"""One-pass dual dyadic contraction: ``y0 @ Z`` and ``y0' @ Z`` together.

At production scale the engine is HBM-bound (README §TPU-native design
notes): every pass over an observation-sized ``(T, n, n)`` tensor costs
milliseconds.  The sufficient-statistics diagnostics need BOTH
``row(Z) = y0 Z`` (row contraction) and ``col(Z) = y0' Z`` (column
contraction) of the same data tensor; as two einsums that is two full
passes (XLA cannot fuse them — the second visits the tensor transposed).
This kernel computes both in ONE streaming pass: each (t, row-tile) grid
step issues two MXU dots — ``W_tile @ Z_t`` into its row-output block and
``W_tile' @ Z_t[tile rows]`` accumulated into the column-output block,
which Pallas keeps resident across the row-tile-innermost grid steps.

History: this kernel carried the ``diag_mode="stats"`` A/B cross-terms
in mixed-precision fits (one data pass instead of two weight passes)
until the reciprocity identity ``W1 = W0'`` made the kernel unnecessary
for that use — ``cavi._data_mean_cross_terms`` now recovers both terms
from ONE plain ``W0 @ [V | U]`` einsum with no padded copy.  The kernel
remains available for workloads that genuinely need row+column
contractions of a NON-symmetric-structured tensor in one pass.

Jacobi-only updates through this kernel were measured and rejected: at
n=2000 Jacobi needs lr <= 0.5 and ~6x the iterations of 8-block
Gauss-Seidel (scripts/jacobi_scale_probe.py), which loses more than the
halved traffic saves.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl

BI = 512  # row-tile height


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dual_kernel(W_ref, Z_ref, Zrows_ref, row_ref, col_ref):
    i = pl.program_id(1)
    W = W_ref[0]                    # (BI, n) bf16
    row_ref[0] = jnp.dot(W, Z_ref[0],
                         preferred_element_type=jnp.float32)
    # column contribution of this row tile: W' @ Z[tile rows]
    partial = jax.lax.dot_general(
        W, Zrows_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (n, MP)

    @pl.when(i == 0)
    def _init():
        col_ref[0] = partial

    @pl.when(i > 0)
    def _acc():
        col_ref[0] = col_ref[0] + partial


def pad_data(y0: Array) -> Array:
    """Pad a ``(T, n, n)`` data tensor to the kernel's bf16 layout once per
    fit (padding per call would re-materialize the full tensor every
    iteration and defeat the traffic saving).

    Only the row (tile) axis needs BI alignment; columns need only
    128-lane alignment — for n just above a BI boundary (e.g. n = 520)
    the resident padded copy is 1024 x 640 instead of 1024 x 1024."""
    T, n, _ = y0.shape
    rows_pad = _pad_to(n, BI)
    cols_pad = _pad_to(n, 128)
    Wp = jnp.zeros((T, rows_pad, cols_pad), jnp.bfloat16)
    return Wp.at[:, :n, :n].set(y0.astype(jnp.bfloat16))


@functools.partial(jax.jit, static_argnames=("interpret",))
def dual_contract_padded(Wp: Array, Z: Array,
                         interpret: bool = False) -> Tuple[Array, Array]:
    """Dual contraction against a pre-padded data tensor (``pad_data``).

    ``Wp (T, rows_pad, cols_pad)`` bf16 (``pad_data`` layout: rows to BI,
    columns to 128 lanes), ``Z (T, n, m)``.  Returns f32 ``(row, col)`` of
    shape ``(T, n, m)`` where ``row = Wp[:n,:n] @ Z`` and
    ``col = Wp[:n,:n]' @ Z`` (padded rows/cols are zero, so they
    contribute nothing)."""
    T, rows_pad, cols_pad = Wp.shape
    n, m = Z.shape[-2], Z.shape[-1]
    mp = _pad_to(m, 128)
    # Z serves both contractions: the row product reads its first cols_pad
    # rows, the per-tile column product reads BI-row tiles up to rows_pad.
    zrows = max(rows_pad, cols_pad)
    Zp = jnp.zeros((T, zrows, mp), jnp.bfloat16)
    Zp = Zp.at[:, :n, :m].set(Z.astype(jnp.bfloat16))

    row, col = pl.pallas_call(
        _dual_kernel,
        grid=(T, rows_pad // BI),
        in_specs=[
            pl.BlockSpec((1, BI, cols_pad), lambda t, i: (t, i, 0)),
            pl.BlockSpec((1, cols_pad, mp), lambda t, i: (t, 0, 0)),
            pl.BlockSpec((1, BI, mp), lambda t, i: (t, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BI, mp), lambda t, i: (t, i, 0)),
            pl.BlockSpec((1, cols_pad, mp), lambda t, i: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, rows_pad, mp), jnp.float32),
            jax.ShapeDtypeStruct((T, cols_pad, mp), jnp.float32),
        ],
        interpret=interpret,
    )(Wp, Zp, Zp)

    return row[:, :n, :m], col[:, :n, :m]


def dual_contract(y0: Array, Z: Array,
                  interpret: bool = False) -> Tuple[Array, Array]:
    """Convenience wrapper: pad + contract (see ``dual_contract_padded``)."""
    return dual_contract_padded(pad_data(y0), Z, interpret=interpret)
