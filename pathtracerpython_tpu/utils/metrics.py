"""Structured metrics: per-phase wall timing and throughput counters.

Replaces the reference's ``print`` + ``tqdm`` observability
(``main.py:187,193,196,207`` and the pool progress bars) with a logger that
accumulates named timings/counters and emits one JSON-able summary —
host-0-only under multi-process runs.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import jax


def _is_host_zero() -> bool:
    return jax.process_index() == 0


class MetricsLogger:
    """Accumulates counters and phase timings; ``summary()`` is JSON-able."""

    def __init__(self):
        self.counters: dict[str, float] = defaultdict(float)
        self.timings: dict[str, float] = defaultdict(float)
        self.calls: dict[str, int] = defaultdict(int)

    def count(self, name: str, value: float = 1.0) -> None:
        self.counters[name] += value

    @contextlib.contextmanager
    def timed(self, phase: str, block_on=None):
        """Time a phase; pass the phase's output pytree as ``block_on`` so
        async dispatch doesn't make the phase look free."""
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            target = box.get("out", block_on)
            if target is not None:
                jax.block_until_ready(target)
            self.timings[phase] += time.perf_counter() - t0
            self.calls[phase] += 1

    def rate(self, counter: str, phase: str) -> float:
        dt = self.timings.get(phase, 0.0)
        return self.counters.get(counter, 0.0) / dt if dt > 0 else 0.0

    def summary(self) -> dict:
        return {
            "counters": dict(self.counters),
            "timings_s": dict(self.timings),
            "calls": dict(self.calls),
        }

    def log(self, printer=print) -> None:
        if _is_host_zero():
            printer(json.dumps(self.summary(), sort_keys=True))


@contextlib.contextmanager
def phase_timer(name: str, log=print):
    """Standalone phase timer with a jax.profiler trace annotation."""
    with jax.profiler.TraceAnnotation(name):
        t0 = time.perf_counter()
        yield
        if _is_host_zero():
            log(f"[{name}] {time.perf_counter() - t0:.3f}s")
