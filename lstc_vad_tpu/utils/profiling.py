"""Tracing / profiling hooks (the reference has none — SURVEY §5).

- ``trace(logdir)``: context manager around jax.profiler for device traces
  viewable in TensorBoard/XProf.
- ``StepTimer``: wall-clock step timing + items/sec (snippets/sec) counter,
  the throughput metric BASELINE.md targets.
- ``annotate``: named trace spans inside jitted host loops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates (steps, items, seconds); .rate() -> items/sec."""

    def __init__(self):
        self.steps = 0
        self.items = 0
        self.seconds = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds += time.perf_counter() - self._t0
        self.steps += 1
        self._t0 = None
        return False

    def add_items(self, n: int):
        self.items += n

    def rate(self) -> float:
        return self.items / self.seconds if self.seconds else 0.0

    def per_step(self) -> float:
        return self.seconds / self.steps if self.steps else 0.0
