"""Vectorized core ops and Pallas TPU kernels."""

from tame.ops import dyad

__all__ = ["dyad"]
