"""Dynamic-batching inference engine — the production serving path.

The reference serves its models through a Streamlit app that runs one
request at a time on whatever shape arrives (reference:
app/backend/model_manager.py:28-381 — every click is a fresh
``model.reconstruct``/``decode`` call).  On TPU that design is doubly wrong:
XLA compiles one program per shape, and per-dispatch overhead dominates
small batches (docs/ROADMAP.md perf notes: ~2.4 ms dispatch floor vs
sub-ms compute at B<=8).  This engine is the TPU-native replacement:

- **Bucketed static shapes** — every micro-batch is padded up to a small
  fixed set of power-of-two buckets, so the compile cache is bounded (one
  program per op x bucket) and nothing ever retraces at serve time.
- **Dynamic batching** — concurrent requests for the same op coalesce into
  one device dispatch (amortizing the dispatch floor), up to ``max_batch``
  or ``max_wait_ms``, whichever comes first.
- **Single device owner** — one dispatcher thread performs every JAX call;
  request threads only enqueue payloads and block on futures, so there is
  no lock contention on the runtime and the device queue never interleaves.

Throughput/latency instrumentation is built in (padding waste, batch-size
histogram, per-op latency quantiles) — the serving observability surface.
"""

from __future__ import annotations

import collections
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["ServeConfig", "BatchingEngine", "EngineStats", "make_sharded_ops"]


@dataclass(frozen=True)
class ServeConfig:
    """Engine knobs.

    ``buckets`` must be ascending; the largest bucket is the max batch the
    device program will ever see.  ``max_wait_ms`` trades tail latency for
    batching opportunity — at 0 the engine degenerates to per-request
    dispatch (useful as a benchmark baseline).
    """

    buckets: Tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64)
    max_wait_ms: float = 2.0
    queue_capacity: int = 4096

    @property
    def max_batch(self) -> int:
        return self.buckets[-1]


@dataclass
class EngineStats:
    requests: int = 0
    batches: int = 0
    rows_padded: int = 0
    rows_real: int = 0
    batch_sizes: collections.Counter = field(default_factory=collections.Counter)
    latencies_ms: Dict[str, collections.deque] = field(default_factory=dict)

    def snapshot(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {
            "requests": self.requests,
            "batches": self.batches,
            "avg_batch": (self.rows_real / self.batches) if self.batches else 0.0,
            "padding_waste": (
                self.rows_padded / (self.rows_padded + self.rows_real)
                if (self.rows_padded + self.rows_real)
                else 0.0
            ),
            "batch_size_hist": dict(self.batch_sizes),
        }
        for op, lat in self.latencies_ms.items():
            arr = np.asarray(lat, dtype=np.float64)
            if arr.size:
                out[f"{op}_p50_ms"] = float(np.percentile(arr, 50))
                out[f"{op}_p99_ms"] = float(np.percentile(arr, 99))
        return out


class _Request:
    __slots__ = ("op", "payload", "extra", "future", "t_enqueue")

    def __init__(self, op: str, payload: np.ndarray, extra: Any):
        self.op = op
        self.payload = payload
        self.extra = extra
        self.future: Future = Future()
        self.t_enqueue = time.perf_counter()


def make_sharded_ops(
    manager,
    mesh,
    generate_n_obs: int = 8,
    generate_method: str = "geodesic",
) -> Dict[str, Callable[[np.ndarray], np.ndarray]]:
    """Op table dispatching each coalesced batch SPMD over a device mesh.

    Data-parallel serving: the bucket-padded batch is sharded over the
    mesh's ``data`` axis (parameters replicated once at build time), so
    serving throughput scales with chips exactly like the DP training step
    (rlvae_tpu/parallel/sharding.py) — one dispatch, XLA splits the batch
    over ICI, the host gathers the output rows.  The reference serves one
    request at a time on one GPU (reference: app/backend/model_manager.py);
    this is the pod-scale replacement.

    Batches whose length does not divide the data axis are padded up by
    repeating the last row (same policy as the engine's bucket padding) and
    sliced back after the gather, so any ``ServeConfig.buckets`` works on
    any mesh.  Deterministic ops (encode/decode) are padding-invariant;
    ``reconstruct`` draws its posterior noise from the padded batch shape,
    matching the engine's existing bucket semantics; ``generate`` derives
    per-row keys from per-row seeds, so padding never changes a row.
    """
    import jax
    import jax.numpy as jnp

    from rlvae_tpu.parallel.mesh import DATA_AXIS
    from rlvae_tpu.parallel.sharding import batch_sharding, replicated

    ndev = mesh.shape[DATA_AXIS]
    bsh = batch_sharding(mesh)
    variables = jax.device_put(manager.variables, replicated(mesh))
    key = jax.device_put(jax.random.PRNGKey(0), replicated(mesh))
    model = manager.model

    from rlvae_tpu.inference import seeded_generate_fn

    fwd = jax.jit(lambda v, x, k: model.forward(v, x, k).recon_x)
    enc = jax.jit(lambda v, x: model.encode(v, x)[0].embedding)
    dec = jax.jit(lambda v, z: model.decode(v, z)[0].reconstruction)
    # adaptive generation needs the calibrated plan to be jittable (the
    # plan's eps/pool become trace-time constants — ModelManager caches it)
    plan = manager.adaptive_plan() if generate_method == "adaptive" else None
    gen = jax.jit(seeded_generate_fn(model, generate_n_obs, generate_method,
                                     plan=plan))

    def sharded(fn, dtype, *extra):
        def op(batch):
            batch = np.asarray(batch, dtype)
            n = batch.shape[0]
            m = -(-n // ndev) * ndev  # round up to a multiple of the data axis
            if m > n:
                pad = np.broadcast_to(batch[-1:], (m - n, *batch.shape[1:]))
                batch = np.concatenate([batch, pad])
            xb = jax.device_put(jnp.asarray(batch), bsh)
            out = fn(variables, xb, *extra)
            # observability: how many devices the last dispatch actually
            # spanned (tests + /api/serving stats read this)
            op.last_out_ndev = len(out.sharding.device_set)
            return np.asarray(out)[:n]

        op.mesh = mesh  # introspection hook for tests/stats
        op.last_out_ndev = 0
        return op

    return {
        "reconstruct": sharded(fwd, np.float32, key),
        "encode": sharded(enc, np.float32),
        "decode": sharded(dec, np.float32),
        "generate": sharded(gen, np.uint32),
    }


class BatchingEngine:
    """Coalesce per-item requests into bucket-padded device batches.

    ``ops`` maps an op name to a callable taking a stacked ``[B, ...]``
    numpy/JAX array and returning a ``[B, ...]`` array-like (row i of the
    output must correspond to row i of the input).  The callable should be a
    jitted closure (e.g. the ones a :class:`rlvae_tpu.inference.ModelManager`
    holds); the engine adds batching, padding, and instrumentation around it.
    """

    def __init__(
        self,
        ops: Dict[str, Callable[[np.ndarray], Any]],
        config: ServeConfig = ServeConfig(),
    ):
        if not ops:
            raise ValueError("BatchingEngine needs at least one op")
        self.ops = dict(ops)
        self.config = config
        # learned per-op item shape (from warmup or the first successful
        # dispatch): lets submit() reject malformed payloads client-side
        # instead of poisoning every co-batched request at np.stack time
        self._item_shapes: Dict[str, Optional[Tuple[int, ...]]] = {op: None for op in ops}
        self.stats = EngineStats(latencies_ms={op: collections.deque(maxlen=2048) for op in ops})
        self._queues: Dict[str, queue.Queue] = {
            op: queue.Queue(maxsize=config.queue_capacity) for op in ops
        }
        self._wakeup = threading.Event()
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._loop, name="serve-dispatch", daemon=True)
        self._thread.start()

    @classmethod
    def from_manager(
        cls,
        manager,
        config: ServeConfig = ServeConfig(),
        generate_n_obs: int = 8,
        generate_method: str = "geodesic",
        mesh=None,
    ) -> "BatchingEngine":
        """Standard op table over a ModelManager: sequence reconstruction,
        frame encoding, latent decoding, and seeded prior generation (the
        ``generate`` payload is ONE scalar seed per item; co-arriving
        requests with different seeds share a dispatch without changing any
        request's output — ModelManager.sample_random_batched_seeds).

        With ``mesh`` set, every dispatch runs SPMD over the mesh's ``data``
        axis (:func:`make_sharded_ops`) — data-parallel serving."""
        if mesh is not None:
            return cls(
                make_sharded_ops(
                    manager, mesh,
                    generate_n_obs=generate_n_obs,
                    generate_method=generate_method,
                ),
                config,
            )
        import jax

        key = jax.random.PRNGKey(0)
        ops = {
            "reconstruct": lambda x: manager._forward(manager.variables, x, key).recon_x,
            "encode": lambda x: manager._encode(manager.variables, x).embedding,
            "decode": lambda z: manager._decode(manager.variables, z).reconstruction,
            "generate": lambda seeds: manager.sample_random_batched_seeds(
                seeds, method=generate_method, n_obs=generate_n_obs
            ),
        }
        return cls(ops, config)

    # -- client side --------------------------------------------------------

    def submit(self, op: str, item: np.ndarray) -> Future:
        """Enqueue ONE item (no batch dim).  Returns a Future resolving to
        this item's output row."""
        if op not in self.ops:
            raise KeyError(f"unknown op {op!r}; have {sorted(self.ops)}")
        req = _Request(op, np.asarray(item), None)
        known = self._item_shapes.get(op)
        if known is not None and req.payload.shape != known:
            # reject HERE so one malformed payload can't fail the whole
            # coalesced batch it would otherwise be stacked into
            raise ValueError(
                f"item shape {req.payload.shape} != expected {known} for op {op!r}"
            )
        # the stop check and the enqueue are one atomic section against
        # stop()'s drain (same lock), so no request can slip into a dead
        # queue after the drain and strand its waiter
        with self._lock:
            if self._stop.is_set():
                raise RuntimeError("BatchingEngine is stopped")
            # put_nowait: blocking here would hold the lock the dispatcher
            # needs for stats and deadlock; a full queue is explicit
            # backpressure instead
            try:
                self._queues[op].put_nowait(req)
            except queue.Full:
                raise RuntimeError(
                    f"serving queue for {op!r} is full "
                    f"({self.config.queue_capacity} pending)"
                ) from None
        self._wakeup.set()
        return req.future

    def run(self, op: str, item: np.ndarray, timeout: Optional[float] = 30.0):
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(op, item).result(timeout=timeout)

    def stats_snapshot(self) -> Dict[str, Any]:
        """Thread-safe stats view (the dispatcher mutates the counters under
        the same lock; iterating them lock-free can raise mid-mutation)."""
        with self._lock:
            return self.stats.snapshot()

    def warmup(self, example_items: Dict[str, np.ndarray], buckets: Optional[Sequence[int]] = None):
        """Compile every (op, bucket) program up front so no request ever
        pays a trace.  ``example_items`` maps op -> one example item."""
        for op, item in example_items.items():
            fn = self.ops[op]
            self._item_shapes[op] = tuple(np.shape(item))
            for b in buckets or self.config.buckets:
                batch = np.broadcast_to(np.asarray(item)[None], (b, *np.shape(item))).copy()
                np.asarray(fn(batch))

    def stop(self, timeout: float = 10.0):
        """Stop the dispatcher.  Requests still queued fail fast with
        ``RuntimeError`` rather than hanging until the client timeout; the
        drain runs under the same lock as submit()'s stop-check+enqueue, so
        no request can race past it."""
        self._stop.set()
        self._wakeup.set()
        self._thread.join(timeout=timeout)
        with self._lock:
            for op in self._queues:
                for req in self._drain(op, self.config.queue_capacity):
                    if not req.future.cancelled():
                        req.future.set_exception(
                            RuntimeError("BatchingEngine stopped before dispatch")
                        )

    # -- dispatcher ---------------------------------------------------------

    def _bucket(self, n: int) -> int:
        for b in self.config.buckets:
            if b >= n:
                return b
        return self.config.max_batch

    def _drain(self, op: str, limit: int) -> List[_Request]:
        out: List[_Request] = []
        q = self._queues[op]
        while len(out) < limit:
            try:
                out.append(q.get_nowait())
            except queue.Empty:
                break
        return out

    def _oldest_op(self) -> Optional[str]:
        best, best_t = None, None
        for op, q in self._queues.items():
            with q.mutex:
                head = q.queue[0] if q.queue else None
            if head is not None and (best_t is None or head.t_enqueue < best_t):
                best, best_t = op, head.t_enqueue
        return best

    def _loop(self):
        cfg = self.config
        while not self._stop.is_set():
            op = self._oldest_op()
            if op is None:
                self._wakeup.wait(timeout=0.05)
                self._wakeup.clear()
                continue
            # batching window: wait (briefly) for co-riders before dispatch
            if cfg.max_wait_ms > 0:
                deadline = time.perf_counter() + cfg.max_wait_ms / 1e3
                while (
                    time.perf_counter() < deadline
                    and self._queues[op].qsize() < cfg.max_batch
                    and not self._stop.is_set()
                ):
                    time.sleep(min(0.0002, cfg.max_wait_ms / 1e3 / 4))
            reqs = self._drain(op, cfg.max_batch)
            if not reqs:
                continue
            self._dispatch(op, reqs)

    def _dispatch(self, op: str, reqs: List[_Request]):
        # first-batch race: shapes unknown until warmup/first dispatch, so a
        # mixed batch can still reach here — fail ONLY the odd rows and keep
        # serving the consistent ones
        shape0 = self._item_shapes.get(op) or reqs[0].payload.shape
        bad = [r for r in reqs if r.payload.shape != shape0]
        if bad:
            reqs = [r for r in reqs if r.payload.shape == shape0]
            for r in bad:
                if not r.future.cancelled():
                    r.future.set_exception(ValueError(
                        f"item shape {r.payload.shape} != expected {shape0} "
                        f"for op {op!r}"
                    ))
            if not reqs:
                return
        n = len(reqs)
        bucket = self._bucket(n)
        try:
            batch = np.stack([r.payload for r in reqs])
            if bucket > n:
                # pad by repeating the last row: keeps the padded rows inside
                # the model's input distribution (zeros can produce inf/nan
                # in log-paths that would pollute XLA's all-reduce fastpaths)
                pad = np.broadcast_to(batch[-1:], (bucket - n, *batch.shape[1:]))
                batch = np.concatenate([batch, pad])
            t0 = time.perf_counter()
            out = np.asarray(self.ops[op](batch))
            dt_ms = (time.perf_counter() - t0) * 1e3
        except Exception as exc:  # propagate to every waiter
            for r in reqs:
                if not r.future.cancelled():
                    r.future.set_exception(exc)
            return
        if self._item_shapes.get(op) is None:
            self._item_shapes[op] = tuple(shape0)
        with self._lock:
            self.stats.requests += n
            self.stats.batches += 1
            self.stats.rows_real += n
            self.stats.rows_padded += bucket - n
            self.stats.batch_sizes[bucket] += 1
            self.stats.latencies_ms[op].append(dt_ms)
        for i, r in enumerate(reqs):
            if not r.future.cancelled():
                r.future.set_result(out[i])
