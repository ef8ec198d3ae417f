"""Profiling / tracing hooks (SURVEY.md section 5.1 — absent in the reference).

- ``trace(logdir)``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable XPlane trace of device execution;
- ``StepTimer``: lightweight wall-clock step timer with percentile summary —
  the per-step observability the reference's Keras progress bar lacked.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace", with_memory: bool = True):
    """Profile everything inside the context onto `logdir`."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self._durations: List[float] = []
        self._t: Optional[float] = None

    def __enter__(self):
        self._t = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._durations.append(time.perf_counter() - self._t)

    def summary(self) -> Dict[str, float]:
        if not self._durations:
            return {}
        d = sorted(self._durations)
        n = len(d)
        return {
            "steps": n,
            "mean_sec": sum(d) / n,
            "p50_sec": d[n // 2],
            "p90_sec": d[min(int(n * 0.9), n - 1)],
            "max_sec": d[-1],
        }
