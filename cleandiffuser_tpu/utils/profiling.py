"""Profiling & observability hooks.

The reference has no tracing/profiling beyond a parameter printer and a
wall-clock Timer (SURVEY.md §5.1). TPU-native additions:

- `trace(...)`: context manager around `jax.profiler` emitting a
  TensorBoard-loadable trace of the wrapped region.
- `Throughput`: running items/sec meter with EMA smoothing (denoise
  steps/sec, env steps/sec counters for the BASELINE metric).
- `annotate`: named TraceAnnotation for marking scan/step regions inside a
  profile.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["trace", "annotate", "Throughput"]


@contextlib.contextmanager
def trace(log_dir: str, with_memory: bool = True):
    """Profile the enclosed region into `log_dir` (TensorBoard format)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class Throughput:
    """items/sec meter with EMA smoothing."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.rate: Optional[float] = None
        self._last = time.perf_counter()

    def update(self, items: int) -> float:
        now = time.perf_counter()
        dt = max(now - self._last, 1e-9)
        self._last = now
        inst = items / dt
        self.rate = inst if self.rate is None else self.ema * self.rate + (1 - self.ema) * inst
        return self.rate
