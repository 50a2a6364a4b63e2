"""Profiling & throughput instrumentation.

The reference's only instrumentation is wall-clock accumulation per batch
(train.py:177,211-212). Here: jax.profiler trace capture behind a flag, a
step timer with edges/s (the north-star throughput gauge, BASELINE.md), and
a debug mode that enables NaN checking.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_context(logdir: str | None):
    """Capture a jax.profiler trace (view with tensorboard / xprof)."""
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


def enable_debug_checks(nans: bool = True) -> None:
    if nans:
        jax.config.update("jax_debug_nans", True)


class StepTimer:
    """Rolling step timing + edges/s. ``update`` once per step."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._edges: list[int] = []
        self._last = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def update(self, edges: int = 0) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            self._edges.append(edges)
            if len(self._times) > self.window:
                self._times.pop(0)
                self._edges.pop(0)
        self._last = now

    @property
    def mean_step_s(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    @property
    def edges_per_s(self) -> float:
        t = sum(self._times)
        return sum(self._edges) / t if t > 0 else 0.0
