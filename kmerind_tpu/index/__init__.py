"""Distributed containers + top-level index API (replaces src/containers,
src/index)."""

from . import store

__all__ = ["store"]
