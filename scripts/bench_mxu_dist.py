#!/usr/bin/env python
"""A/B: centered-MXU distance expansion vs the exact difference loop in the
fused metric bundle (VERDICT r2 item 8).

Round 2 measured the RAW expansion |c|^2 - 2c.z + |z|^2 at 2.4x faster but
rejected it for 2e-5 relative weight error (cancellation at |z|^2 scale).
Round 3 centers the expansion on the centroid mean (_weights_slab_mxu), which
shrinks the cancellation scale from |z|^2 to the centroid spread — measured
(interpret/fp32, vs float64 ground truth on the real artifacts): g_inv
scaled max err 7.4e-7 (exact arm: 7.3e-7); on the T0.7x3 flagship metric the
centered arm is slightly MORE accurate (2.5e-7 vs 3.2e-7).

Each arm is compiled at the measured shape via the STATIC ``mxu_dist`` flag
(separate programs — immune to the trace-time A/B trap, CLAUDE.md).
Rounds are interleaved to defuse the axon per-process lottery.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main():
    import jax
    import jax.numpy as jnp

    from rlvae_tpu.geometry import load_metric
    from rlvae_tpu.ops.metric_kernels import metric_bundle_pallas

    metric = load_metric(ROOT / "data" / "pretrained" / "metric.npz")
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    results = {}

    # -- accuracy on device (both arms vs float64 ground truth) -------------
    idx = rng.integers(0, metric.n_centroids, size=4096)
    z_acc = (np.asarray(metric.centroids)[idx]
             + 0.1 * rng.normal(size=(4096, 16))).astype(np.float32)
    c64 = np.asarray(metric.centroids, np.float64)
    m64 = np.asarray(metric.matrices, np.float64)
    d2 = ((z_acc[:, None, :].astype(np.float64) - c64[None]) ** 2).sum(-1)
    w = np.exp(-d2 / float(metric.temperature) ** 2)
    gi64 = np.einsum("bk,kij->bij", w, m64) + float(metric.regularization) * np.eye(16)
    ld64 = np.linalg.slogdet(gi64)[1]
    ARMS = {"exact": False, "mxu": True, "mxu_high": "high"}
    for name, arm in ARMS.items():
        out = metric_bundle_pallas(metric, jnp.asarray(z_acc), mxu_dist=arm)
        gi = np.asarray(out.g_inv, np.float64)
        results[f"{name}_gi_scaled_max_err"] = float(
            np.abs(gi - gi64).max() / np.abs(gi64).max()
        )
        results[f"{name}_logdet_max_abs_err"] = float(
            np.abs(np.asarray(out.logdet_g_inv, np.float64) - ld64).max()
        )

    # -- perf A/B, interleaved rounds per shape ------------------------------
    for b, tb in ((8192, 512), (65536, 2048)):
        idx = rng.integers(0, metric.n_centroids, size=b)
        z = jnp.asarray(
            np.asarray(metric.centroids)[idx] + 0.1 * rng.normal(size=(b, 16)),
            jnp.float32,
        )
        fns = {}
        for name, arm in ARMS.items():
            # each arm runs at its LARGEST feasible tile (the bf16_3x arm's
            # extra live f32 slab can overflow scoped VMEM at TB=2048 —
            # shipping it would mean shipping its tile too, so that is the
            # honest comparison)
            for tb_arm in (tb, tb - 256, tb - 512, tb // 2):
                f = (
                    lambda z=z, tb_arm=tb_arm, arm=arm:
                    metric_bundle_pallas(metric, z, tb=tb_arm, mxu_dist=arm)
                )
                try:
                    for _ in range(5):  # compile + warm at THIS shape
                        out = f()
                    jax.block_until_ready(out.g)
                    fns[name] = f
                    if tb_arm != tb:
                        results[f"b{b}_tb{tb}_{name}_tile"] = tb_arm
                    break
                except Exception as e:
                    if "vmem" not in str(e).lower():
                        raise
                    print(f"{name}@tb={tb_arm}: VMEM OOM, trying smaller",
                          file=sys.stderr)
        times = {k: [] for k in fns}
        for _ in range(7):  # interleaved rounds
            for k, f in fns.items():
                t0 = time.perf_counter()
                for _ in range(20):
                    out = f()
                jax.block_until_ready(out.g)
                times[k].append((time.perf_counter() - t0) / 20)
        med = {k: float(np.median(v)) for k, v in times.items()}
        for k, v in med.items():
            results[f"b{b}_tb{tb}_{k}_us"] = round(v * 1e6, 1)
        for k in ARMS:
            if k != "exact":
                results[f"b{b}_tb{tb}_{k}_speedup"] = round(med["exact"] / med[k], 3)
        print(
            f"B={b} TB={tb}: "
            + "  ".join(f"{k} {v * 1e6:.1f}us" for k, v in med.items())
            + "  |  "
            + "  ".join(
                f"{k} {med['exact'] / med[k]:.2f}x" for k in ARMS if k != "exact"
            ),
            file=sys.stderr,
        )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
