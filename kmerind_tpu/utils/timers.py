"""Phase timers + memory marks — the observability layer.

Rebuild of the reference's BL_TIMER/BL_BENCH macro system
(/root/reference/src/utils/timer.hpp:398-431,
src/utils/benchmark_utils.hpp): named per-phase wall-clock sections
accumulated per process and reported with min/max/mean/stdev statistics.
Where the reference reduces across MPI ranks (Timer::report(title, comm),
timer.hpp:265), `report(cross_host=True)` / `cross_host_stats()` reduce
per-process phase totals across all jax processes via
`jax.experimental.multihost_utils.process_allgather`; the default report
reduces across recorded samples on this process.  Output format mirrors the
reference's ``[TIME]`` CSV lines so the same tooling
(utils/extract_timing.sh) applies.
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

    def cross_host_stats(self) -> dict[str, dict[str, float]]:
        """Per-phase totals reduced across ALL jax processes — the analog
        of the reference's collective report (Timer::report(title, comm),
        timer.hpp:265: min/max/mean/stdev of each rank's duration).

        Every process must call this collectively (it allgathers).  Single-
        process runs reduce over one sample.  Phases are aligned by sorted
        name union, so processes may record different phase sets.
        """
        import json

        import jax
        import numpy as np

        totals = {n: self.total(n) for n in self.durations}
        if jax.process_count() == 1:
            per_proc = [totals]
        else:
            from jax.experimental import multihost_utils

            # ship each process's {phase: total} dict as padded utf-8 bytes
            payload = json.dumps(totals).encode()
            buf = np.zeros(65536, np.uint8)
            buf[: len(payload)] = np.frombuffer(payload, np.uint8)
            gathered = np.asarray(multihost_utils.process_allgather(buf))
            per_proc = []
            for row in gathered:
                raw = bytes(row.tobytes()).rstrip(b"\x00")
                per_proc.append(json.loads(raw.decode()) if raw else {})
        names = sorted({n for d in per_proc for n in d})
        out = {}
        for name in names:
            vals = [d.get(name, 0.0) for d in per_proc]
            out[name] = {
                "count": len(vals),
                "sum": sum(vals),
                "min": min(vals),
                "max": max(vals),
                "mean": statistics.fmean(vals),
                "stdev": statistics.pstdev(vals) if len(vals) > 1 else 0.0,
            }
        return out

    def report(self, title: str = "", cross_host: bool = False) -> str:
        """[TIME] CSV lines, reference format: header + durations
        (timer.hpp report_loc).  With cross_host=True the stats are the
        min/max/mean/stdev of per-process phase totals (collective — every
        process must call it), matching BL_TIMER_REPORT_MPI."""
        lines = []
        hdr = f"[TIME] {title}\tphase\tcount\tsum\tmin\tmax\tmean\tstdev"
        lines.append(hdr)
        stats = self.cross_host_stats() if cross_host else self.stats()
        for name, s in stats.items():
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
