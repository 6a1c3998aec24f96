"""Tracing / profiling helpers.

The reference only prints wall-clock deltas (simulators.py:294,361,374).  Here
training and rollout steps can be wrapped with `jax.profiler` trace
annotations and a steps/sec reporter; ``trace_to`` dumps a TensorBoard-style
trace for the profiler UI.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device trace (no-op cost when not tracing)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace_to(logdir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Steps/sec + items/sec counter with periodic reporting."""

    def __init__(self, report_every: int = 50, logger=None):
        self.report_every = report_every
        self.logger = logger
        self._t0: Optional[float] = None
        self._steps = 0
        self._items = 0

    def step(self, items: int = 1) -> Optional[float]:
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
            return None
        self._steps += 1
        self._items += items
        if self._steps % self.report_every == 0:
            dt = now - self._t0
            rate = self._steps / dt
            item_rate = self._items / dt
            if self.logger is not None:
                self.logger.log(steps_per_sec=rate, items_per_sec=item_rate)
            return rate
        return None
