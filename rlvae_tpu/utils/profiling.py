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


def scan_slope_time(fn, batches, m_small: int = 8, reps: int = 5):
    """Honest per-call DEVICE time of ``fn`` over a stack of distinct inputs.

    Every eager-loop timing through a remoted/async backend is suspect, and
    on this harness concretely wrong in BOTH directions (measured, round 5):

    - ``jax.block_until_ready`` on an eagerly dispatched op can return
      before the device executed it ("fast-lottery" processes measure the
      ~30 us RPC enqueue rate — a 13 ms kernel reads as 29 us);
    - in other processes every compiled-program EXECUTION carries a flat
      ~25-30 ms dispatch RPC, so per-call loop timings measure the
      dispatch floor, not the kernel (an 17 us kernel reads as 600+ us).

    The only dispatch-invariant measurement is a SLOPE inside one compiled
    program: run ``lax.scan`` over M distinct inputs for two values of M
    and divide the wall-clock difference by the iteration difference — the
    per-dispatch cost (whatever it is this process) cancels exactly, and
    distinct per-iteration inputs defeat any transport-level caching.

    ``batches``: pytree whose array leaves share a leading axis M (M
    distinct argument sets; make them DIFFERENT values, not M repeats).
    ``fn`` maps one slice (leading axis dropped) to any pytree of arrays;
    outputs are reduced to one scalar inside the program so live memory
    stays flat and nothing is dead-code-eliminated.

    Returns ``(seconds_per_call, diagnostics)`` where diagnostics carries
    the two program wall-clocks and the inferred per-dispatch overhead.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.tree_util import tree_leaves, tree_map

    leaves = tree_leaves(batches)
    m_total = int(leaves[0].shape[0])
    if m_total <= m_small:
        raise ValueError(f"need more than m_small={m_small} input sets, got {m_total}")

    @jax.jit
    def many(stacked):
        def body(acc, one):
            out = fn(one)
            return acc + sum(jnp.sum(l).astype(jnp.float32)
                             for l in tree_leaves(out)), 0.0
        acc, _ = lax.scan(body, jnp.zeros((), jnp.float32), stacked)
        return acc

    def timed_total(stacked):
        out = many(stacked)
        jax.block_until_ready(out)  # compile + settle
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = many(stacked)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts))  # additive noise -> min is the estimator

    small = tree_map(lambda a: a[:m_small], batches)
    t_small = timed_total(small)
    t_big = timed_total(batches)
    per_call = max((t_big - t_small) / (m_total - m_small), 1e-12)
    return per_call, {
        "t_small_s": t_small,
        "t_big_s": t_big,
        "m_small": m_small,
        "m_big": m_total,
        "dispatch_overhead_s": max(t_small - m_small * per_call, 0.0),
    }


def fori_slope_time(body, carry0, n_small: int = 4, n_big: int = 16,
                    reps: int = 5):
    """Dispatch-invariant per-iteration DEVICE time with ONE compile.

    Same rationale as :func:`scan_slope_time` (per-program dispatch cost
    through a remoted backend can dwarf or hide the kernel; the slope of
    wall-clock vs iteration count cancels it), but the trip count is a
    DYNAMIC argument to ``lax.fori_loop``, so both timings reuse one
    compiled program — important when the body is a whole train step whose
    compile is tens of seconds.

    ``body(i, carry) -> carry`` must make the iteration's compute depend on
    ``i`` (fold a key, index a staged stack, perturb the input) — a
    loop-invariant body would let XLA hoist the work out of the loop.

    Returns ``(seconds_per_iteration, diagnostics)``.
    """
    import jax

    from jax import lax

    @jax.jit
    def run(n, carry):
        return lax.fori_loop(0, n, body, carry)

    def timed(n):
        out = run(n, carry0)
        jax.block_until_ready(out)  # compile (first call) + settle
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(n, carry0)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        # MIN, not median: tunnel/dispatch noise is strictly additive, so
        # the minimum over reps converges on the true program time and the
        # slope of minima is the most stable per-iteration estimator here
        return float(np.min(ts))

    t_small = timed(n_small)
    t_big = timed(n_big)
    per_iter = max((t_big - t_small) / (n_big - n_small), 1e-12)
    return per_iter, {
        "t_small_s": t_small,
        "t_big_s": t_big,
        "n_small": n_small,
        "n_big": n_big,
        "dispatch_overhead_s": max(t_small - n_small * per_iter, 0.0),
    }


def auto_slope_time(body, carry0, target_delta_s: float = 0.25,
                    n_small: int = 2, n_cap: int = 32768, reps: int = 5):
    """:func:`fori_slope_time` with the trip count sized from a pilot run.

    A slope needs the iteration-count delta to dominate wall-clock noise;
    a 20 us kernel timed at n_big=8 measures nothing.  Pilot at (n_small,
    16), then re-measure with ``n_big`` chosen so the extra iterations take
    ~``target_delta_s`` of device time (capped at ``n_cap``).  Both phases
    reuse the same compiled program (the trip count is dynamic).

    If the measured delta still fails to materialize (slope * extra
    iterations under 20% of the target — the tunnel's run-to-run floor
    jitter swallowed it), the trip count doubles and the measurement
    retries, twice at most; the largest-delta attempt is returned.  A
    degenerate near-zero slope must never escape into a headline number.
    """
    pilot, diag = fori_slope_time(body, carry0, n_small=n_small, n_big=16,
                                  reps=max(2, reps // 2))
    if pilot * 14 >= target_delta_s:  # slow body: pilot delta already ample
        return fori_slope_time(body, carry0, n_small=n_small, n_big=16,
                               reps=reps)
    n_big = int(min(n_cap, max(32, target_delta_s / max(pilot, 1e-9))))
    for _ in range(3):
        t, diag = fori_slope_time(body, carry0, n_small=n_small,
                                  n_big=n_big, reps=reps)
        if (t * (n_big - n_small) >= 0.2 * target_delta_s
                or n_big >= n_cap):
            return t, diag
        n_big = min(n_cap, n_big * 2)
    return t, diag
