#!/usr/bin/env python
"""A/B the IAF chain's fixed-point solvers vs the sequential algorithms.

Two independent switches (ops/iaf_kernels.py):
- forward: D sequential dim-steps (fp_iters=0) vs K+1 Jacobi passes
  (fp_iters=K; bit-exact at K >= D-1);
- backward: legacy per-dim reverse sweep (adj_sweeps=0: D x (MADE recompute
  + VJP + weight-grad outer products)) vs the adjoint fixed-point VJP
  (adj_sweeps=S: one MADE pass + S light input-VJP sweeps + one grad VJP;
  EXACT at S >= D by nilpotency).

This measures the flagship train step (forward+grad+Adam) across the arm
matrix and reports speedups vs the round-2 production arm (seq fwd + legacy
bwd), plus in-process numerical deltas (loss and latent deviation with
identical weights/inputs) so speed and accuracy land in one artifact.

Within-process, interleaved reps, median; each arm compiled AT the measured
batch shape while its overrides are in force (CLAUDE.md trace-time-gating
gotcha — ADJ_SWEEPS_OVERRIDE is resolved before the build cache).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402


def make_step(metric, fp_iters: int, adj_sweeps: int | None, batch: int):
    """Build + COMPILE a train-step runner at `batch` with the given
    forward iteration count and backward mode (None = auto adjoint)."""
    import jax
    import jax.numpy as jnp

    from rlvae_tpu.models import RlVAE
    from rlvae_tpu.ops import iaf_kernels
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
    prev = iaf_kernels.ADJ_SWEEPS_OVERRIDE
    iaf_kernels.ADJ_SWEEPS_OVERRIDE = adj_sweeps
    try:
        run(x, jax.random.PRNGKey(1), 3)  # compile at the measured shape
    finally:
        iaf_kernels.ADJ_SWEEPS_OVERRIDE = prev
    return run


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


def grad_probe(metric, batch: int = 16):
    """Adjoint vs legacy backward on identical weights/inputs: max scaled
    gradient deviation across every parameter leaf."""
    import jax
    import jax.numpy as jnp

    from rlvae_tpu.models import RlVAE
    from rlvae_tpu.ops import iaf_kernels

    model = RlVAE(
        input_dim=(3, 64, 64), latent_dim=16, n_flows=8,
        posterior_type="riemannian_metric", metric=metric,
    )
    v = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(3).uniform(size=(batch, 8, 3, 64, 64)).astype(np.float32)
    )

    def loss(params):
        out = model.forward({**v, "params": params}, x, jax.random.PRNGKey(2))
        return out["loss"]

    grads = {}
    for label, sweeps in (("legacy", 0), ("adjoint", None)):
        prev = iaf_kernels.ADJ_SWEEPS_OVERRIDE
        iaf_kernels.ADJ_SWEEPS_OVERRIDE = sweeps
        try:
            grads[label] = jax.device_get(jax.grad(loss)(v["params"]))
        finally:
            iaf_kernels.ADJ_SWEEPS_OVERRIDE = prev
    worst = 0.0
    for a, b in zip(
        jax.tree_util.tree_leaves(grads["legacy"]),
        jax.tree_util.tree_leaves(grads["adjoint"]),
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1e-3, float(np.abs(a).max()))
        worst = max(worst, float(np.abs(b - a).max() / scale))
    return worst


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
    print(f"fwd parity @K={k}: |dloss|={dl:.3e}  max rel |dz_seq|={dz:.3e}")
    gd = grad_probe(metric)
    print(f"bwd parity adjoint-vs-legacy: max scaled grad dev={gd:.3e}")

    arms = [
        ("seq+legacy", 0, 0),       # round-2 production program
        ("seq+adjoint", 0, None),   # exact fwd, exact adjoint bwd (D sweeps)
        (f"fp{k}+adjoint", k, None),  # K+1-pass fwd, K+1-sweep bwd
    ]
    for batch in batches:
        x = jnp.asarray(
            np.random.default_rng(0)
            .uniform(size=(batch, 8, 3, 64, 64))
            .astype(np.float32)
        )
        key = jax.random.PRNGKey(1)
        runs = [(lbl, make_step(metric, fp, adj, batch)) for lbl, fp, adj in arms]
        for _, r in runs:
            r(x, key, 3)
        times = {lbl: [] for lbl, _ in runs}
        for _ in range(7):  # interleaved A/B rounds
            for lbl, r in runs:
                times[lbl].append(r(x, key, 10))
        med = {lbl: float(np.median(ts)) * 1e3 for lbl, ts in times.items()}
        base = med["seq+legacy"]
        print(
            f"B={batch}: "
            + "  ".join(f"{lbl} {m:.3f} ms ({base / m:.2f}x)" for lbl, m in med.items())
        )


if __name__ == "__main__":
    main()
