"""Device-level tracing helpers (the TPU analog of SURVEY.md §5.1).

The reference's observability is wall-clock prints + progress bars; on TPU
the right tool is the XLA profiler. ``trace(dir)`` wraps a region so every
jitted cascade dispatch inside is captured for TensorBoard / xprof, and
``annotate(name)`` labels host-side stages inside a trace.
"""

from __future__ import annotations

import contextlib

__all__ = ["trace", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed region into log_dir."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Context manager labeling a host-side region inside a profiler trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)
