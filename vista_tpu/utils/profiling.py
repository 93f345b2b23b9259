"""Tracing / profiling helpers (SURVEY.md §5.1 — the reference has none).

- ``trace(logdir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-viewable XPlane trace of device + host activity;
- ``StepTimer``: wall-clock step timing with ``block_until_ready`` fencing,
  tracking p50/p90 and steps/sec;
- ``annotate``: named host-side trace regions.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation


class StepTimer:
    """Collects fenced step durations; report() gives p50/p90/mean."""

    def __init__(self):
        self.durations: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        assert self._t0 is not None, "call start() first"
        self.durations.append(time.perf_counter() - self._t0)
        self._t0 = None

    @contextlib.contextmanager
    def step(self):
        self.start()
        out = {}
        try:
            yield out
        finally:
            self.stop(out.get("result"))

    def report(self) -> dict:
        if not self.durations:
            return {}
        d = sorted(self.durations)
        n = len(d)
        return {
            "steps": n,
            "p50_s": d[n // 2],
            "p90_s": d[min(int(n * 0.9), n - 1)],
            "mean_s": sum(d) / n,
            "steps_per_sec": n / sum(d),
        }
