"""Persistent XLA compilation cache.

The reference compiles one binary per index configuration offline (the
CMake type matrix of BenchmarkKmerIndex,
/root/reference/test/benchmark/BenchmarkKmerIndex.cpp:45-260), so a user
never waits on a compiler at run time.  This framework jit-compiles at
first use instead — and the fused ingest/merge programs take minutes of
XLA+Mosaic work on the TPU backend.  Wiring JAX's persistent compilation
cache gives the same compile-once-per-config economics: every jitted
step (ingest, merge, query, ...) is keyed by (program, shapes, backend)
and reloaded from disk on later runs of the same process OR later
processes, cutting a multi-minute cold start to cache-deserialization
time.

Enabled automatically on ``import kmerind_tpu`` (set
``KMERIND_TPU_NO_COMPILE_CACHE=1`` to opt out, or
``KMERIND_TPU_COMPILE_CACHE=<dir>`` to relocate the default
``~/.cache/kmerind_tpu/xla``).
"""

from __future__ import annotations

import os

__all__ = ["enable"]

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache",
                        "kmerind_tpu", "xla")


def enable(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at `path` (created if
    missing).  Returns the cache dir, or None when disabled/unavailable.

    Safe to call more than once; the last path wins.  Entries of every
    size and compile time are cached: the LSM build's step programs are
    exactly the multi-second compiles the cache exists for, and even the
    small glue jits are worth the few kB each.
    """
    if os.environ.get("KMERIND_TPU_NO_COMPILE_CACHE"):
        return None
    # CPU runs (tests' virtual mesh, the driver dryrun) skip the cache:
    # XLA:CPU AOT deserialization logs a machine-feature-mismatch warning
    # per load (pseudo-features like +prefer-no-scatter fail the host
    # check), and CPU compiles are seconds, not minutes
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        return None
    if path is None:
        path = os.environ.get("KMERIND_TPU_COMPILE_CACHE", _DEFAULT)
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        # default min compile time is 1s: below-threshold programs would
        # re-compile every cold start; cache everything instead
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - best-effort (old jax, RO fs)
        return None
    return path
