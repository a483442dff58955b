"""Profiling/tracing hooks (SURVEY.md §5.1: the reference had none beyond an
ad-hoc NFE counter). Wraps jax.profiler so any training run can emit a
TensorBoard-viewable trace of the XLA programs, plus a lightweight step timer.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace('runs/x/trace'): step(...)``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (shows up in the profiler timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Rolling wall-clock stats for train steps (host-side; pair with a scalar
    sync per window when the backend dispatches asynchronously)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: List[float] = []
        self._last = None

    def tick(self):
        now = time.time()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    def stats(self) -> Dict[str, float]:
        if not self._times:
            return {}
        ts = sorted(self._times)
        n = len(ts)
        return {
            "step_ms_p50": ts[n // 2] * 1000,
            "step_ms_p90": ts[int(n * 0.9)] * 1000,
            "step_ms_mean": sum(ts) / n * 1000,
        }
