"""Runtime utilities: checkpoint/resume, metrics, profiling.

The reference has none of these — a render is one shot, a worker exception
kills the run, and observability is ``print`` + ``tqdm``
(``main.py:187-231``). Here: orbax-backed checkpoints of accumulation and
optimizer state (resume + progressive refinement), structured per-phase
metrics, and ``jax.profiler`` trace hooks.
"""

from pathtracerpython_tpu.utils.checkpoint import (
    CheckpointManager,
    render_progressive,
)
from pathtracerpython_tpu.utils.metrics import MetricsLogger, phase_timer
from pathtracerpython_tpu.utils.profiling import trace_context

__all__ = [
    "CheckpointManager",
    "render_progressive",
    "MetricsLogger",
    "phase_timer",
    "trace_context",
]
