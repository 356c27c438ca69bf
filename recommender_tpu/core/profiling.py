"""Profiling / tracing hooks (first-class, per SURVEY.md §5 "Rebuild").

The reference's only observability is a TensorBoard callback and tqdm
counters (``ctr/train.py:94``, ``dien/train.py:47-59``). Here:

* ``trace(dir)``          — context manager around ``jax.profiler`` trace
  capture (open in TensorBoard / xprof, includes XLA op breakdown);
* ``StepTimer``           — wall-clock per-step timing with warmup skip and
  percentile summary;
* ``annotate``            — ``TraceAnnotation`` wrapper so host phases (data
  loading, sampling) show up on the trace timeline.
"""
from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates per-step wall times; ``summary()`` gives p50/p90/mean."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self._times: list[float] = []
        self._t0 = None
        self._steps = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._steps += 1
        if self._steps > self.warmup:
            self._times.append(dt)

    def summary(self) -> dict:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "steps": len(arr),
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p90_ms": float(np.percentile(arr, 90) * 1e3),
            "max_ms": float(arr.max() * 1e3),
        }
