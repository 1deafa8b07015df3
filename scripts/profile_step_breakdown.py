"""Decompose the flagship train step's wall-clock on the chip.

Times each stage of the step in isolation (jitted, device-staged inputs,
median-of-reps) so the MFU plateau can be attributed to a specific op class
instead of argued: encoder fwd, decoder fwd at [B*T], temporal flows fwd,
riemannian KL, full forward, forward+grad, and the complete optimizer step —
for both the density (parity) and sampling (stable) presets.

Also prints XLA's own cost analysis for the compiled step (flop count /
bytes accessed) next to bench.py's analytic model, so any flops the model
under-counts show up immediately.

Usage: python scripts/profile_step_breakdown.py [--batch 4096]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def bench(fn, *args, n=10, reps=3):
    import jax

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
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--t", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from rlvae_tpu.geometry import load_metric
    from rlvae_tpu.models import RlVAE
    from rlvae_tpu.models import losses
    from rlvae_tpu.flows import apply_temporal_flows
    from rlvae_tpu.train.optim import make_optimizer
    from rlvae_tpu.train.trainer import make_train_step

    metric = load_metric(REPO / "data" / "pretrained" / "metric.npz")
    B, T = args.batch, args.t
    print(f"device: {jax.devices()[0]}  B={B} T={T}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, T, 3, 64, 64), dtype=np.float32))
    key = jax.random.PRNGKey(1)

    for preset, overrides in (
        ("density(parity)", {}),
        ("sampling(stable)", dict(flow_direction="sampling",
                                  flow_loss_mode="volume",
                                  flow_log_var_bias_init=0.0)),
    ):
        model = RlVAE(input_dim=(3, 64, 64), latent_dim=16, n_flows=8,
                      posterior_type="riemannian_metric", metric=metric,
                      **overrides)
        v = model.init(jax.random.PRNGKey(0))
        opt = make_optimizer(1e-3, 0.0)
        os_ = opt.init(v["params"])
        step = make_train_step(model, opt)

        # stage inputs
        x0 = x[:, 0]
        z_flat = jnp.asarray(rng.normal(size=(B * T, 16)), jnp.float32)
        z0 = jnp.asarray(rng.normal(size=(B, 16)), jnp.float32)
        mu = z0 + 0.1

        enc = jax.jit(lambda vv, xx: model.encode(vv, xx)[0].embedding)
        dec = jax.jit(lambda vv, zz: model.decode(vv, zz)[0].reconstruction)
        flows = jax.jit(lambda vv, zz: apply_temporal_flows(
            model.flow_config, vv["params"]["flows"], zz, T)[0])
        rkl = jax.jit(lambda zz, mm: losses.riemannian_metric_kl(metric, mm, zz))
        fwd = jax.jit(lambda vv, xx, kk: model.forward(vv, xx, kk, train=True).loss)

        def loss_fn(params, vv, xx, kk):
            vv = dict(vv, params=params)
            return model.forward(vv, xx, kk, train=True).loss

        grad = jax.jit(jax.grad(loss_fn))

        t_enc = bench(enc, v, x0)
        t_dec = bench(dec, v, z_flat)
        t_flow = bench(flows, v, z0)
        t_rkl = bench(rkl, z0, mu)
        t_fwd = bench(fwd, v, x, key)
        t_grad = bench(grad, v["params"], v, x, key)
        # full step (donated) — fresh state each call would retrace; reuse
        v2, os2 = v, os_
        for _ in range(2):
            v2, os2, m = step(v2, os2, x, key)
        jax.block_until_ready(m)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                v2, os2, m = step(v2, os2, x, key)
            jax.block_until_ready(m)
            ts.append((time.perf_counter() - t0) / 5)
        t_step = float(np.median(ts))

        print(f"\n== {preset} ==", flush=True)
        print(f"encoder fwd  [B,3,64,64]      : {t_enc*1e3:8.2f} ms")
        print(f"decoder fwd  [B*T,16]         : {t_dec*1e3:8.2f} ms")
        print(f"flows fwd    [B,16] -> [B,T,16]: {t_flow*1e3:8.2f} ms")
        print(f"riemannian KL [B]             : {t_rkl*1e3:8.2f} ms")
        print(f"forward (loss)                : {t_fwd*1e3:8.2f} ms")
        print(f"forward+grad                  : {t_grad*1e3:8.2f} ms")
        print(f"train step (grad+adam, donate): {t_step*1e3:8.2f} ms")

        try:
            comp = jax.jit(lambda vv, oo, xx, kk: step(vv, oo, xx, kk)).lower(
                v2, os2, x, key).compile()
            ca = comp.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            fl = ca.get("flops", float("nan"))
            by = ca.get("bytes accessed", float("nan"))
            print(f"XLA cost_analysis: flops={fl:.3e} bytes={by:.3e} "
                  f"(flops@peak={fl/197e12*1e3:.2f} ms, "
                  f"bytes@hbm={by/819e9*1e3:.2f} ms)")
        except Exception as e:
            print(f"cost_analysis unavailable: {e}")


if __name__ == "__main__":
    main()
