"""Int8 packed-mask panel contraction: ``(mask rows) @ Z`` at 1 byte/entry.

Missing-data fits contract the (n, n, T) dyad observation mask against
per-(node, time) feature panels every iteration (masked partner
statistics: counts, sums, Grams — ``cavi._masked_obs_precision``,
``cavi._masked_residual_stats``).  The mask is 0/1, yet the einsum path
streams it as bf16 (2 bytes) or f32 (4 bytes); at n=2000/T=50 that is
400-800 MB of HBM per pass on pure indicator data.  This kernel stores
the mask ONCE as int8 (200 MB), upcasts tiles to bf16 in VMEM, and runs
the MXU dot from there — halving the mask-pass traffic, which is what
separates masked from dense per-iteration cost at scale.

Layout: the mask is packed per update block (``pack_mask``) as
``(num_blocks, T, bs_pad, n_pad) int8`` with rows block-major, so block
Gauss-Seidel phases slice their stripe with one ``dynamic_index`` and
full-mask contractions (diagnostics) loop the blocks.  ``bs_pad`` is the
block height padded to the row-tile ``BI``; ``n_pad`` pads partners to
the 128-lane boundary.  Padded rows/columns are zero and contribute
nothing.

No reference counterpart (complete networks only,
``naive_mf.py:324-374``).

**Measured negative result (2026-08-21, n=2000/T=50/r=4):** this kernel
ran at ~40 ms/iter against ~13 ms for the bf16-einsum mask path — the
int8 byte saving is outweighed by per-call overheads (the feature panel
is re-padded to the (T, n_pad, Kp) kernel layout on every invocation,
the output transposes back, and full-mask diagnostics issue one kernel
call per block stripe).  Since consolidating the masked statistics into
ONE concatenated-panel einsum already brought masked fits to ~1.1x the
dense per-iteration cost, the kernel is OPT-IN only
(``TAME_PACKED_MASK=1``); making it win requires keeping the panel in
kernel layout across the whole iteration, i.e. moving the masked update
itself into Pallas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl

BI = 256  # row-tile height (int8 sublane tile is 32; 256 keeps the MXU fed)


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_mask(mask: Array, num_blocks: int) -> Array:
    """Pack an (n, n, T) observation mask into the kernel layout
    ``(num_blocks, T, bs_pad, n_pad) int8`` (one-time, at fit start)."""
    n, _, T = mask.shape
    if n % num_blocks:
        raise ValueError(f"num_blocks={num_blocks} must divide n={n}")
    bs = n // num_blocks
    bs_pad = _pad_to(bs, BI)
    n_pad = _pad_to(n, 128)
    m8 = jnp.moveaxis(mask, -1, 0).astype(jnp.int8)        # (T, n, n)
    m8 = m8.reshape(T, num_blocks, bs, n)
    out = jnp.zeros((num_blocks, T, bs_pad, n_pad), jnp.int8)
    return out.at[:, :, :bs, :n].set(jnp.moveaxis(m8, 1, 0))


def _kernel(M_ref, Z_ref, out_ref):
    M = M_ref[0].astype(jnp.bfloat16)                      # (BI, n_pad)
    out_ref[0] = jnp.dot(M, Z_ref[0],
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def packed_rows_contract(Mp: Array, Z: Array,
                         interpret: bool = False) -> Array:
    """Contract one packed block stripe against a feature panel.

    Parameters
    ----------
    Mp : (T, bs_pad, n_pad) int8 — one entry of :func:`pack_mask`.
    Z : (n, T, K) features per (partner, time).

    Returns
    -------
    (bs_pad, T, K) float32 ``sum_j M[i, j] Z[j, t]`` (caller slices the
    true rows).
    """
    T, bs_pad, n_pad = Mp.shape
    n, _, K = Z.shape
    Kp = _pad_to(K, 128)
    Zt = jnp.zeros((T, n_pad, Kp), jnp.bfloat16)
    Zt = Zt.at[:, :n, :K].set(
        jnp.moveaxis(Z, 1, 0).astype(jnp.bfloat16))
    out = pl.pallas_call(
        _kernel,
        grid=(T, bs_pad // BI),
        in_specs=[
            pl.BlockSpec((1, BI, n_pad), lambda t, i: (t, i, 0)),
            pl.BlockSpec((1, n_pad, Kp), lambda t, i: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BI, Kp), lambda t, i: (t, i, 0)),
        out_shape=jax.ShapeDtypeStruct((T, bs_pad, Kp), jnp.float32),
        interpret=interpret,
    )(Mp, Zt)
    return jnp.moveaxis(out[..., :K], 0, 1)                # (bs_pad, T, K)
