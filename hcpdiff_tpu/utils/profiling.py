"""Profiling hooks (absent in the reference, SURVEY.md §5.1):
jax profiler traces + per-step wall timing for the logger stream."""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str = '/tmp/jax_trace') -> Iterator[None]:
    """Capture a jax profiler trace viewable in TensorBoard/Perfetto."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA-smoothed step timing; device-sync on demand only."""

    def __init__(self, smoothing: float = 0.9):
        self.smoothing = smoothing
        self.ema_ms: Optional[float] = None
        self._t0 = time.perf_counter()

    def tick(self) -> float:
        now = time.perf_counter()
        dt = (now - self._t0) * 1000.0
        self._t0 = now
        self.ema_ms = dt if self.ema_ms is None else (
            self.smoothing * self.ema_ms + (1 - self.smoothing) * dt)
        return dt

    @property
    def steps_per_sec(self) -> float:
        return 1000.0 / self.ema_ms if self.ema_ms else 0.0
