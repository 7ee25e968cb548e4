"""Device-trace profiling — the jax profiler as the tracing backend.

The reference's tracing is the BL_TIMER macro system (timer.hpp); the TPU
analog for *device-side* attribution is the XLA profiler.  `trace()` wraps
a region and writes a TensorBoard-loadable trace; `annotate()` names a
sub-region so kernels group under it.
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["trace", "annotate"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/kmerind_tpu_trace"):
    """Capture a device trace for the enclosed region.

    View with: tensorboard --logdir <logdir>  (or xprof).

    Note: on remote-tunneled TPU backends (this session's axon relay)
    stop_trace can block waiting for device trace data; profile on a local
    backend or guard with a timeout in such environments.
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region (TraceAnnotation) for kernel grouping."""
    return jax.profiler.TraceAnnotation(name)
