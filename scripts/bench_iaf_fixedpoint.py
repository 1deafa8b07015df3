#!/usr/bin/env python
"""A/B the Jacobi fixed-point IAF density blocks vs the sequential dim scan.

The density-direction block solves the strictly triangular system
y = (x - mu(y)) * exp(-s(y)); the production path runs D sequential
dim-steps (one full MADE pass each), the fixed-point path runs K+1 Jacobi
passes (ops/iaf_kernels.py, fp_iters).  This measures the flagship train
step (forward+grad+Adam) with fp_iters in {0, K} and reports the speedup,
plus the in-process numerical deltas (loss and final-latent deviation with
identical weights/inputs) so speed and accuracy land in one artifact.

Within-process, interleaved reps, median; each arm compiled AT the measured
batch shape while its config is in force (CLAUDE.md trace-time-gating
gotcha).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402


def make_step(metric, fp_iters: int, batch: int):
    """Build + COMPILE a train-step runner at `batch` with the given
    fixed-point iteration count (0 = exact sequential scan)."""
    import jax
    import jax.numpy as jnp

    from rlvae_tpu.models import RlVAE
    from rlvae_tpu.train.optim import make_optimizer
    from rlvae_tpu.train.trainer import make_train_step

    model = RlVAE(
        input_dim=(3, 64, 64), latent_dim=16, n_flows=8,
        posterior_type="riemannian_metric", metric=metric,
        flow_fixedpoint_iters=fp_iters,
    )
    v = model.init(jax.random.PRNGKey(0))
    opt = make_optimizer(1e-3, 0.0)
    os_ = opt.init(v["params"])
    step = make_train_step(model, opt)

    state = {"v": v, "os": os_}

    def run(x, key, n):
        t0 = time.perf_counter()
        for _ in range(n):
            state["v"], state["os"], m = step(state["v"], state["os"], x, key)
        jax.block_until_ready(m)
        return (time.perf_counter() - t0) / n

    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(batch, 8, 3, 64, 64)).astype(np.float32)
    )
    run(x, jax.random.PRNGKey(1), 3)  # compile at the measured shape
    return run, state, model


def parity_probe(metric, fp_iters: int, batch: int = 16):
    """Forward the SAME weights/inputs through both paths; report deltas."""
    import jax
    import jax.numpy as jnp

    from rlvae_tpu.models import RlVAE

    def fwd(k):
        model = RlVAE(
            input_dim=(3, 64, 64), latent_dim=16, n_flows=8,
            posterior_type="riemannian_metric", metric=metric,
            flow_fixedpoint_iters=k,
        )
        v = model.init(jax.random.PRNGKey(0))
        x = jnp.asarray(
            np.random.default_rng(3)
            .uniform(size=(batch, 8, 3, 64, 64))
            .astype(np.float32)
        )
        return model.forward(v, x, jax.random.PRNGKey(2))

    a = fwd(0)
    b = fwd(fp_iters)
    dl = abs(float(a["loss"]) - float(b["loss"]))
    z_a, z_b = np.asarray(a["z"]), np.asarray(b["z"])
    rel = np.abs(z_b - z_a) / np.maximum(np.abs(z_a), 1.0)
    return dl, float(rel.max())


def main():
    import jax
    import jax.numpy as jnp

    from rlvae_tpu.geometry import load_metric

    metric = load_metric(REPO_ROOT / "data" / "pretrained" / "metric.npz")
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    k = int(os.environ.get("FP_BENCH_ITERS", "8"))
    batches = tuple(
        int(b) for b in os.environ.get("FP_BENCH_BATCHES", "4,64").split(",")
    )

    dl, dz = parity_probe(metric, k)
    print(f"parity @K={k}: |dloss|={dl:.3e}  max rel |dz_seq|={dz:.3e}")

    for batch in batches:
        x = jnp.asarray(
            np.random.default_rng(0)
            .uniform(size=(batch, 8, 3, 64, 64))
            .astype(np.float32)
        )
        key = jax.random.PRNGKey(1)
        run_seq, _, _ = make_step(metric, 0, batch)
        run_fp, _, _ = make_step(metric, k, batch)
        run_seq(x, key, 3)
        run_fp(x, key, 3)
        seq_t, fp_t = [], []
        for _ in range(7):  # interleaved A/B rounds
            seq_t.append(run_seq(x, key, 10))
            fp_t.append(run_fp(x, key, 10))
        s = float(np.median(seq_t)) * 1e3
        f = float(np.median(fp_t)) * 1e3
        print(
            f"B={batch}: sequential {s:.3f} ms/step vs fixedpoint(K={k}) "
            f"{f:.3f} ms/step -> {s / f:.2f}x"
        )


if __name__ == "__main__":
    main()
