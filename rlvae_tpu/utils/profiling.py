"""Profiling / tracing hooks.

The reference's only instrumentation is wall-clock wrappers around metric
calls (reference: hybrid_rlvae.py:174-190 `_metric_computation_time`) and
per-batch-size latency loops in tests.  Here profiling is first-class:

- :func:`trace` wraps ``jax.profiler`` to capture a device trace viewable in
  TensorBoard/Perfetto (enable with ``training.trainer.profile: true``),
- :class:`StepTimer` aggregates per-step host wall-clock with EMA and
  percentiles, surfacing `steps_per_sec` in the metrics stream,
- :func:`timed` is the hybrid model's call-counting wrapper for arbitrary
  functions (used in benchmarks and diagnostics).
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str | Path, enabled: bool = True):
    """Capture a jax.profiler device trace into ``log_dir``."""
    if not enabled:
        yield
        return
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock accounting for training steps."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: Optional[float] = None
        self.samples: list[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else self.ema * self.avg + (1 - self.ema) * dt
        self.samples.append(dt)
        if len(self.samples) > 1000:
            self.samples = self.samples[-1000:]
        return dt

    def metrics(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        arr = np.asarray(self.samples)
        return {
            "step_time_avg": float(self.avg),
            "step_time_p50": float(np.percentile(arr, 50)),
            "step_time_p99": float(np.percentile(arr, 99)),
            "steps_per_sec": float(1.0 / max(self.avg, 1e-9)),
        }


class timed:
    """Call-count + cumulative-time wrapper (the hybrid model's
    instrumentation as a reusable decorator)."""

    def __init__(self, fn, sync=True):
        self.fn = fn
        self.sync = sync
        self.calls = 0
        self.total_time = 0.0

    def __call__(self, *args, **kwargs):
        t0 = time.perf_counter()
        out = self.fn(*args, **kwargs)
        if self.sync:
            import jax

            jax.block_until_ready(out)
        self.total_time += time.perf_counter() - t0
        self.calls += 1
        return out

    @property
    def mean_time(self) -> float:
        return self.total_time / max(self.calls, 1)
