#!/usr/bin/env python
"""A/B the whole-chain IAF mega-kernel vs per-transition fused kernels.

Measures the flagship train step (forward+grad+Adam, donated) with the
temporal chain running as ONE Pallas program (chain) vs one program per
transition (per-t).  Within-process, interleaved reps, median — the axon
tunnel's per-process variance makes cross-process comparisons meaningless
(CLAUDE.md).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402


def make_step(metric, force_per_transition: bool, batch: int):
    """Build + COMPILE a train-step runner for `batch` with the chosen flow
    backend.  The kernel choice is baked in at trace time, so the warmup
    trace MUST happen at the target batch shape while the gate overrides are
    in force — a warmup at a different shape would silently retrace later
    under the production gate and both arms would measure the same program.
    """
    import jax
    import jax.numpy as jnp

    import rlvae_tpu.ops.iaf_kernels as ik
    from rlvae_tpu.models import RlVAE
    from rlvae_tpu.train.optim import make_optimizer
    from rlvae_tpu.train.trainer import make_train_step

    saved_max, saved_min = ik.CHAIN_MAX_BATCH, ik.CHAIN_MIN_BATCH
    if force_per_transition:
        ik.CHAIN_MAX_BATCH = 0
    else:
        # force the chain at EVERY batch size (the production gate is
        # CHAIN_MIN_BATCH; this script exists to measure both sides of it)
        ik.CHAIN_MIN_BATCH = 1
    try:
        model = RlVAE(
            input_dim=(3, 64, 64), latent_dim=16, n_flows=8,
            posterior_type="riemannian_metric", metric=metric,
        )
        v = model.init(jax.random.PRNGKey(0))
        opt = make_optimizer(1e-3, 0.0)
        os_ = opt.init(v["params"])
        step = make_train_step(model, opt)

        def run(x, key, n):
            nonlocal v, os_
            t0 = time.perf_counter()
            for _ in range(n):
                v, os_, m = step(v, os_, x, key)
            jax.block_until_ready(m)
            return (time.perf_counter() - t0) / n

        # warmup/compile AT THE TARGET SHAPE with the gate override in force
        x = jnp.asarray(
            np.random.default_rng(0)
            .uniform(size=(batch, 8, 3, 64, 64))
            .astype(np.float32)
        )
        run(x, jax.random.PRNGKey(1), 3)
        return run
    finally:
        ik.CHAIN_MAX_BATCH, ik.CHAIN_MIN_BATCH = saved_max, saved_min


def main():
    import jax
    import jax.numpy as jnp

    from rlvae_tpu.geometry import load_metric

    metric = load_metric(REPO_ROOT / "data" / "pretrained" / "metric.npz")
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    import os

    batches = tuple(
        int(b) for b in os.environ.get("CHAIN_BENCH_BATCHES", "4,64").split(",")
    )
    for batch in batches:
        x = jnp.asarray(
            np.random.default_rng(0)
            .uniform(size=(batch, 8, 3, 64, 64))
            .astype(np.float32)
        )
        key = jax.random.PRNGKey(1)
        run_chain = make_step(metric, force_per_transition=False, batch=batch)
        run_pert = make_step(metric, force_per_transition=True, batch=batch)
        run_chain(x, key, 3)
        run_pert(x, key, 3)
        chain_t, pert_t = [], []
        for _ in range(7):  # interleaved A/B rounds
            chain_t.append(run_chain(x, key, 10))
            pert_t.append(run_pert(x, key, 10))
        c = float(np.median(chain_t)) * 1e3
        p = float(np.median(pert_t)) * 1e3
        print(
            f"B={batch}: chain {c:.3f} ms/step vs per-transition {p:.3f} ms/step "
            f"-> {p / c:.2f}x"
        )


if __name__ == "__main__":
    main()
