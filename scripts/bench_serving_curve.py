#!/usr/bin/env python
"""Serving throughput curves on the real chip: rate vs batch size.

Sweeps the device-side batched-inference rate for the three serving
surfaces a production deployment cares about

- reconstruct: flagship forward (riemannian posterior, 8 flows) — the
  ModelManager path bench.py measures at one batch size,
- generate: official HMC prior chain + flow evolution + decode,
- encode: posterior parameters only (the cheap embedding path),

and writes ``outputs/serving_curve/serving_curve.json`` with per-batch
latency and throughput plus the saturation summary (the knee shows where
dispatch overhead amortizes and the MXU saturates).  All timings are
within-process, warmed per shape, median of reps (the axon tunnel's
cross-process lottery makes anything else meaningless — CLAUDE.md).

Usage: python scripts/bench_serving_curve.py  (runs on jax.devices()[0])
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def timed(fn, *args, reps=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / reps)
    return float(np.median(times))


def main():
    import jax
    import jax.numpy as jnp

    from rlvae_tpu.geometry import load_metric
    from rlvae_tpu.models import RlVAE

    metric = load_metric(REPO / "data" / "pretrained" / "metric.npz")
    model = RlVAE(
        input_dim=(3, 64, 64), latent_dim=16, n_flows=8,
        posterior_type="riemannian_metric", metric=metric,
    )
    v = model.init(jax.random.PRNGKey(0))
    fwd = jax.jit(lambda vv, x, k: model.forward(vv, x, k))
    enc = jax.jit(lambda vv, x: model.encode(vv, x)[0].embedding)
    gens = {}  # generate jits per static num_samples

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    report = {"device": str(jax.devices()[0]), "curves": {}}

    for b in (1, 4, 16, 64, 256):
        x = jax.device_put(jnp.asarray(
            rng.uniform(size=(b, 8, 3, 64, 64)).astype(np.float32)
        ))
        x0 = x[:, 0]
        row = {}
        t = timed(fwd, v, x, key, reps=max(3, 256 // b))
        row["reconstruct"] = {"ms": t * 1e3, "seq_per_s": b / t}
        t = timed(enc, v, x0, reps=max(3, 512 // b))
        row["encode"] = {"ms": t * 1e3, "seq_per_s": b / t}
        if b not in gens:
            gens[b] = jax.jit(
                lambda vv, k, n=b: model.generate(vv, k, n, method="hmc")
            )
        t = timed(gens[b], v, key, reps=3)
        row["generate_hmc"] = {"ms": t * 1e3, "seq_per_s": b / t}
        report["curves"][str(b)] = row
        print(
            f"B={b:4d}  reconstruct {row['reconstruct']['seq_per_s']:9.1f} seq/s"
            f"  encode {row['encode']['seq_per_s']:10.1f} seq/s"
            f"  generate(HMC 20x15) {row['generate_hmc']['seq_per_s']:7.1f} seq/s",
            file=sys.stderr,
        )

    bs = sorted(report["curves"], key=int)
    peak = {
        surface: max(report["curves"][b][surface]["seq_per_s"] for b in bs)
        for surface in ("reconstruct", "encode", "generate_hmc")
    }
    b1 = {s: report["curves"][bs[0]][s]["seq_per_s"] for s in peak}
    report["summary"] = {
        "peak_seq_per_s": peak,
        "batch_amortization_x": {s: peak[s] / b1[s] for s in peak},
    }
    out = REPO / "outputs" / "serving_curve"
    out.mkdir(parents=True, exist_ok=True)
    (out / "serving_curve.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report["summary"], indent=2))
    print(f"wrote {out / 'serving_curve.json'}", file=sys.stderr)


if __name__ == "__main__":
    main()
