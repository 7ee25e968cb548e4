"""Observability + configuration utilities (replaces src/utils timers/logging)."""

from .checkpoint import load_index, save_index
from .timers import MemUsage, PhaseTimer

__all__ = ["PhaseTimer", "MemUsage", "save_index", "load_index"]
