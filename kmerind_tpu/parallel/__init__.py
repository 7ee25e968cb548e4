"""Mesh + collective distribution layer (replaces mxx/imxx)."""

from . import distribute, mesh
from .mesh import SHARD_AXIS, make_mesh

__all__ = ["distribute", "mesh", "make_mesh", "SHARD_AXIS"]
