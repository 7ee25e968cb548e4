"""Vectorized compute kernels: packing, bit ops, hashing, sort primitives."""

from . import bitops, hashing, packing, sortops

__all__ = ["bitops", "hashing", "packing", "sortops"]
