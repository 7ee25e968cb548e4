"""Observability + configuration utilities (replaces src/utils timers/logging)."""

from .timers import MemUsage, PhaseTimer

__all__ = ["PhaseTimer", "MemUsage"]
