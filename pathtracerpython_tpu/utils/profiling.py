"""Profiler hooks: capture device traces (Perfetto/TensorBoard-viewable).

Usage::

    with trace_context("/tmp/trace"):
        render(...)  # then open the trace dir in perfetto/tensorboard
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace_context(log_dir: str, host_tracer_level: int = 2):
    """jax.profiler trace over a code region (no-op safe on any backend)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator: wrap a function in a named profiler annotation."""
    def deco(fn):
        import functools

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        return wrapper

    return deco
