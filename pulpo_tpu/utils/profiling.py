"""Profiling utilities (the reference has none; SURVEY.md section 5).

- `trace(dir)`: context manager around jax.profiler traces (view with
  TensorBoard or Perfetto).
- `StepTimer`: rolling step-time statistics with a one-line report,
  chained through block_until_ready so async runtimes can't skew it.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self._t = None
        self._n = 0

    def tic(self):
        self._t = time.perf_counter()

    def toc(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")

    @property
    def p50(self) -> float:
        return float(np.median(self.times)) if self.times else float("nan")

    def report(self, name: str = "step") -> str:
        if not self.times:
            return f"{name}: no timed steps"
        return (f"{name}: mean {self.mean*1e3:.1f} ms, p50 {self.p50*1e3:.1f} ms, "
                f"n={len(self.times)}")
