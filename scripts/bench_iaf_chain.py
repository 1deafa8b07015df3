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


def make_step(metric, force_per_transition: bool):
    import jax
    import jax.numpy as jnp

    import rlvae_tpu.ops.iaf_kernels as ik
    from rlvae_tpu.models import RlVAE
    from rlvae_tpu.train.optim import make_optimizer
    from rlvae_tpu.train.trainer import make_train_step

    saved = ik.CHAIN_MAX_BATCH
    ik.CHAIN_MAX_BATCH = 0 if force_per_transition else saved
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

        # warmup/compile with the flag still in force
        x = jnp.asarray(
            np.random.default_rng(0).uniform(size=(4, 8, 3, 64, 64)).astype(np.float32)
        )
        run(x, jax.random.PRNGKey(1), 3)
        return run
    finally:
        ik.CHAIN_MAX_BATCH = saved


def main():
    import jax
    import jax.numpy as jnp

    from rlvae_tpu.geometry import load_metric

    metric = load_metric(REPO_ROOT / "data" / "pretrained" / "metric.npz")
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    for batch in (4, 64):
        x = jnp.asarray(
            np.random.default_rng(0)
            .uniform(size=(batch, 8, 3, 64, 64))
            .astype(np.float32)
        )
        key = jax.random.PRNGKey(1)
        run_chain = make_step(metric, force_per_transition=False)
        run_pert = make_step(metric, force_per_transition=True)
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
