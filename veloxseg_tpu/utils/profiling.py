"""Profiling / observability helpers (SURVEY §5 tracing).

- :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory (the TPU-native replacement for
  the reference's wall-clock + thop instrumentation).
- :class:`ThroughputMeter` — patches/sec meter for train loops.
- :func:`flops_estimate` — XLA ``cost_analysis`` FLOPs for a jitted fn
  (replaces thop profiling, ``speed_test.py:96-99``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace; view with TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Sliding-window patches/sec meter."""

    def __init__(self):
        self._t0: Optional[float] = None
        self._patches = 0
        self.total_patches = 0

    def start(self):
        self._t0 = time.perf_counter()
        self._patches = 0

    def update(self, batch: int):
        if self._t0 is None:
            self.start()
        self._patches += batch
        self.total_patches += batch

    def rate(self) -> float:
        if self._t0 is None or self._patches == 0:
            return 0.0
        return self._patches / (time.perf_counter() - self._t0)


def flops_estimate(fn, *args) -> Optional[float]:
    """Total FLOPs of ``fn(*args)`` per XLA's compiled cost analysis."""
    try:
        analysis = jax.jit(fn).lower(*args).compile().cost_analysis()
        if analysis and "flops" in analysis:
            return float(analysis["flops"])
    except Exception:
        pass
    return None
