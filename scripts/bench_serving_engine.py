#!/usr/bin/env python
"""Dynamic-batching engine vs per-request dispatch under concurrent load.

Drives the :class:`rlvae_tpu.serving.BatchingEngine` with N concurrent client
threads issuing single-item requests (the reference app's access pattern,
one Streamlit click = one request) and compares

- ``batched``  : engine with its batching window (requests coalesce into
  bucket-padded device batches), vs
- ``serial``   : the same engine with ``max_wait_ms=0`` and buckets=(1,)
  (every request is its own dispatch — the reference app's behavior),

reporting throughput and client-side latency percentiles for the encode and
reconstruct surfaces.  Writes ``outputs/serving_engine/serving_engine.json``.
Within-process, warmed per (op, bucket), so numbers are comparable
(CLAUDE.md: the axon tunnel's cross-process lottery).

Usage: python scripts/bench_serving_engine.py [n_requests] [--mesh]

``--mesh`` builds the engines over the full device mesh (data-parallel
serving, rlvae_tpu.serving.make_sharded_ops) — on a multi-chip host the
batched mode then scales with chips; on one chip it is a no-op.
"""

from __future__ import annotations

import json
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def drive(engine, op, items, n_threads=8):
    """Fire all items from n_threads concurrent clients; return wall time and
    per-request latencies."""
    latencies = [0.0] * len(items)
    futures = [None] * len(items)

    def client(idx0, step):
        for i in range(idx0, len(items), step):
            t0 = time.perf_counter()
            futures[i] = (engine.submit(op, items[i]), t0)

    t_start = time.perf_counter()
    threads = [threading.Thread(target=client, args=(j, n_threads)) for j in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, (f, t0) in enumerate(futures):
        f.result(timeout=300)
        latencies[i] = time.perf_counter() - t0
    wall = time.perf_counter() - t_start
    return wall, np.asarray(latencies)


def main():
    import jax

    from rlvae_tpu.geometry import load_metric
    from rlvae_tpu.inference import ModelManager
    from rlvae_tpu.models import RlVAE
    from rlvae_tpu.serving import BatchingEngine, ServeConfig

    args = [a for a in sys.argv[1:] if a != "--mesh"]
    use_mesh = "--mesh" in sys.argv[1:]
    n_requests = int(args[0]) if args else 256
    mesh = None
    if use_mesh:
        from rlvae_tpu.parallel import create_mesh

        mesh = create_mesh()
        print(f"mesh serving over {jax.device_count()} devices", file=sys.stderr)

    metric = load_metric(REPO / "data" / "pretrained" / "metric.npz")
    model = RlVAE(
        input_dim=(3, 64, 64), latent_dim=16, n_flows=8,
        posterior_type="riemannian_metric", metric=metric,
    )
    mgr = ModelManager(model, model.init(jax.random.PRNGKey(0)))

    rng = np.random.default_rng(0)
    frames = rng.uniform(size=(n_requests, 3, 64, 64)).astype(np.float32)
    seqs = rng.uniform(size=(n_requests // 4, 8, 3, 64, 64)).astype(np.float32)

    report = {"device": str(jax.devices()[0]), "n_requests": n_requests,
              "mesh_devices": jax.device_count() if use_mesh else 1, "modes": {}}
    for mode, cfg in (
        ("serial", ServeConfig(buckets=(1,), max_wait_ms=0.0)),
        # a coarse bucket set keeps warm-up compiles (each flagship forward
        # ~20-40 s to compile) to 4 per op while still amortizing dispatch
        ("batched", ServeConfig(buckets=(1, 4, 16, 64), max_wait_ms=3.0)),
    ):
        eng = BatchingEngine.from_manager(mgr, cfg, mesh=mesh)
        try:
            eng.warmup({"encode": frames[0], "reconstruct": seqs[0],
                        "generate": np.uint32(0)})
            rows = {}
            for op, items in (
                ("encode", list(frames)),
                ("reconstruct", list(seqs)),
                # seeded generation: one seed per request, batchable because
                # the op vmaps the per-row key derivation
                ("generate", [np.uint32(s) for s in range(n_requests // 4)]),
            ):
                wall, lat = drive(eng, op, items)
                rows[op] = {
                    "wall_s": wall,
                    "req_per_s": len(items) / wall,
                    "p50_ms": float(np.percentile(lat, 50) * 1e3),
                    "p99_ms": float(np.percentile(lat, 99) * 1e3),
                }
                print(
                    f"{mode:8s} {op:12s} {rows[op]['req_per_s']:8.1f} req/s  "
                    f"p50 {rows[op]['p50_ms']:7.2f} ms  p99 {rows[op]['p99_ms']:7.2f} ms",
                    file=sys.stderr,
                )
            rows["engine_stats"] = eng.stats.snapshot()
            report["modes"][mode] = rows
        finally:
            eng.stop()

    s, b = report["modes"]["serial"], report["modes"]["batched"]
    report["summary"] = {
        op: {
            "throughput_x": b[op]["req_per_s"] / s[op]["req_per_s"],
            "p50_x": s[op]["p50_ms"] / b[op]["p50_ms"],
        }
        for op in ("encode", "reconstruct", "generate")
    }
    out = REPO / "outputs" / "serving_engine"
    out.mkdir(parents=True, exist_ok=True)
    (out / "serving_engine.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report["summary"], indent=2))
    print(f"wrote {out / 'serving_engine.json'}", file=sys.stderr)


if __name__ == "__main__":
    main()
