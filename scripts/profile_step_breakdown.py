"""Decompose the flagship train step's wall-clock on the chip — committed.

Times each stage of the step in isolation (jitted, device-staged inputs,
median-of-reps) so the MFU plateau can be attributed to a specific op class
instead of argued: encoder fwd, decoder fwd at [B*T], temporal flows fwd,
posterior sampling, riemannian KL, full forward, forward+grad, and the
complete optimizer step — for the density (parity) and sampling (stable)
presets, plus the beyond-parity TPU-shaped config (latent 128 / flow hidden
512) that falsifies-or-proves the tile-fill reading of the plateau
(VERDICT r4 items 1-2).

For every stage it also records XLA's own cost analysis (flops / bytes
accessed) so each stage gets an honest achieved-vs-peak number computed
from the compiler's flop count, not only the analytic model's.

Writes outputs/step_breakdown/results.json + SUMMARY.md (gated by
tests/test_step_breakdown.py).

Usage: python scripts/profile_step_breakdown.py [--batch 4096] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

PEAK = 197e12  # v5e bf16 peak (see bench.py)
HBM = 819e9


def compile_once(jitted, *args):
    """AOT-compile a jitted fn once; reuse for timing AND cost analysis."""
    return jitted.lower(*args).compile()


def cost(compiled):
    """XLA cost analysis {flops, bytes} for a compiled callable, or {}."""
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return {
            "flops": float(ca.get("flops", float("nan"))),
            "bytes": float(ca.get("bytes accessed", float("nan"))),
        }
    except Exception as e:  # pragma: no cover - compiler API drift
        return {"error": str(e)}


def profile_preset(name, model, metric, B, T, latent, rng, results):
    import jax
    import jax.numpy as jnp

    from rlvae_tpu.flows import apply_temporal_flows
    from rlvae_tpu.models import losses
    from rlvae_tpu.samplers import sample_metric_aware_posterior
    from rlvae_tpu.train.optim import make_optimizer
    from rlvae_tpu.train.trainer import make_train_step

    x = jnp.asarray(rng.random((B, T, *model.input_dim), dtype=np.float32))
    key = jax.random.PRNGKey(1)

    v = model.init(jax.random.PRNGKey(0))
    opt = make_optimizer(1e-3, 0.0)
    os_ = opt.init(v["params"])
    step = make_train_step(model, opt)

    x0 = x[:, 0]
    z_flat = jnp.asarray(rng.normal(size=(B * T, latent)), jnp.float32)
    z0 = jnp.asarray(rng.normal(size=(B, latent)), jnp.float32)
    mu = z0 + 0.1
    log_var = jnp.zeros_like(mu)

    enc = jax.jit(lambda vv, xx: model.encode(vv, xx)[0].embedding)
    dec = jax.jit(lambda vv, zz: model.decode(vv, zz)[0].reconstruction)
    flows = jax.jit(lambda vv, zz: apply_temporal_flows(
        model.flow_config, vv["params"]["flows"], zz, T)[0])
    fwd = jax.jit(lambda vv, xx, kk: model.forward(vv, xx, kk, train=True).loss)

    def loss_fn(params, vv, xx, kk):
        vv = dict(vv, params=params)
        return model.forward(vv, xx, kk, train=True).loss

    grad = jax.jit(jax.grad(loss_fn))

    # per-stage bodies perturb one input by the loop index so nothing is
    # loop-invariant (XLA would hoist it); timing is the fori-loop SLOPE of
    # one compiled program (utils/profiling.auto_slope_time) — eager-loop
    # stage timings through this harness measure the RPC path, not the
    # device (round-5 finding; the first version of this artifact reported
    # a 4e11-flop decoder forward at 0.10 ms = 2078% of peak that way).
    # XLA cost analysis still comes from the stage's own AOT compile.
    eps = 1e-6
    stage_list = [
        ("encoder_fwd", enc, (v, x0),
         lambda i: enc(v, x0 + eps * i)),
        ("decoder_fwd_BT", dec, (v, z_flat),
         lambda i: dec(v, z_flat + eps * i)),
        ("flows_fwd", flows, (v, z0),
         lambda i: flows(v, z0 + eps * i)),
    ]
    if metric is not None and model.posterior_type == "riemannian_metric":
        post = jax.jit(lambda kk, mm, lv: sample_metric_aware_posterior(
            metric, kk, mm, lv))
        rkl = jax.jit(lambda zz, mm: losses.riemannian_metric_kl(metric, mm, zz))
        stage_list += [
            ("posterior_sample", post, (key, mu, log_var),
             lambda i: post(jax.random.fold_in(key, i), mu, log_var)),
            ("riemannian_kl", rkl, (z0, mu),
             lambda i: rkl(z0 + eps * i, mu)),
        ]
    stage_list += [
        ("forward_loss", fwd, (v, x, key),
         lambda i: fwd(v, x, jax.random.fold_in(key, i))),
        ("forward_grad", grad, (v["params"], v, x, key),
         lambda i: grad(v["params"], v, x, jax.random.fold_in(key, i))),
    ]

    from jax.tree_util import tree_leaves

    from rlvae_tpu.utils.profiling import auto_slope_time

    stages = {}
    costs = {}
    for sname, fn, args, body_i in stage_list:
        c = compile_once(fn, *args)

        def body(i, acc, _b=body_i):
            out = _b(i)
            return acc + sum(jnp.sum(l).astype(jnp.float32)
                             for l in tree_leaves(out))

        t, _diag = auto_slope_time(body, jnp.zeros((), jnp.float32), reps=3)
        stages[sname] = t * 1e3
        costs[sname] = cost(c)
        print(f"  {sname:18s}: {stages[sname]:8.2f} ms "
              + (f"(xla {costs[sname].get('flops', 0):.3e} flops -> "
                 f"{costs[sname].get('flops', 0) / (stages[sname] / 1e3) / PEAK * 100:5.1f}% of peak, "
                 f"{costs[sname].get('bytes', 0):.3e} B -> "
                 f"{costs[sname].get('bytes', 0) / (stages[sname] / 1e3) / HBM * 100:5.1f}% of HBM)"
                 if "flops" in costs[sname] else ""),
              flush=True)

    # full step (donated) — ONE AOT compile serves timing + cost analysis;
    # reuse the returned state so donation doesn't invalidate inputs
    step_c = compile_once(step, v, os_, x, key)
    costs["train_step"] = cost(step_c)

    from rlvae_tpu.utils.profiling import fori_slope_time

    def step_body(i, carry):
        vv, oo = carry
        vv, oo, _m = step(vv, oo, x, jax.random.fold_in(key, i))
        return (vv, oo)

    t_step, _ = fori_slope_time(step_body, (v, os_), n_small=2, n_big=6,
                                reps=3)
    stages["train_step"] = t_step * 1e3
    print(f"  {'train_step':18s}: {stages['train_step']:8.2f} ms", flush=True)

    results[name] = {"batch": B, "t": T, "latent": latent,
                     "stage_ms": stages, "xla_cost": costs}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--t", type=int, default=8)
    p.add_argument("--out", type=Path, default=REPO / "outputs" / "step_breakdown")
    args = p.parse_args()

    import jax

    from rlvae_tpu.geometry import load_metric
    from rlvae_tpu.geometry.metric import CentroidMetric
    from rlvae_tpu.models import RlVAE

    metric = load_metric(REPO / "data" / "pretrained" / "metric.npz")
    B, T = args.batch, args.t
    print(f"device: {jax.devices()[0]}  B={B} T={T}", flush=True)
    rng = np.random.default_rng(0)
    results = {"device": str(jax.devices()[0]), "batch": B, "t": T}

    stable = dict(flow_direction="sampling", flow_loss_mode="volume",
                  flow_log_var_bias_init=0.0)
    for name, latent, flow_hid, met, overrides in (
        ("density_parity", 16, 256, metric, {}),
        ("sampling_stable", 16, 256, metric, dict(stable)),
        # HBM-traffic harvest: bf16 reconstructions + checkpointed
        # decode+MSE (the step is byte-bound at B=4096 — most bytes are
        # recon-sized tensors saved for the backward)
        ("stable_bf16_remat", 16, 256, metric,
         dict(stable, remat_decode=True,
              decoder_config={"out_dtype": "bfloat16"})),
        # beyond-parity TPU-shaped config: latent/flow widths that fill the
        # 128-lane MXU tile.  Gaussian posterior: at D=128 the metric
        # linalg (batched 128x128 Cholesky through jnp.linalg) is its own
        # bottleneck regime (measured 0.1-0.2% of peak, 64-107 ms/stage)
        # and would drown the matmul tile-fill signal this config exists
        # to isolate.
        ("tpu_shaped_128", 128, 512, None,
         dict(stable, remat_decode=True,
              decoder_config={"out_dtype": "bfloat16"})),
    ):
        print(f"\n== {name} (latent {latent}, flow_hidden {flow_hid}) ==",
              flush=True)
        posterior = "riemannian_metric" if met is not None else "gaussian"
        model = RlVAE(input_dim=(3, 64, 64), latent_dim=latent, n_flows=8,
                      flow_hidden_size=flow_hid,
                      posterior_type=posterior, metric=met,
                      use_riemannian=met is not None,
                      **overrides)
        profile_preset(name, model, met, B, T, latent, rng, results)

    args.out.mkdir(parents=True, exist_ok=True)
    (args.out / "results.json").write_text(json.dumps(results, indent=2))

    # attribution summary
    lines = ["# Train-step breakdown (on-chip)", "",
             f"Device: {results['device']}, B={B}, T={T}.  Stage timings are",
             "isolated jitted medians; `train_step` is the full donated",
             "grad+Adam step.  `% peak` uses XLA's own flop count for the",
             "compiled stage against the v5e bf16 peak; `% HBM` likewise",
             "against 819 GB/s.", ""]
    for name, r in results.items():
        if not isinstance(r, dict) or "stage_ms" not in r:
            continue
        lines += [f"## {name}", "",
                  "| stage | ms | XLA flops | % peak | XLA bytes | % HBM |",
                  "|---|---|---|---|---|---|"]
        for s, ms in r["stage_ms"].items():
            c = r["xla_cost"].get(s, {})
            fl, by = c.get("flops"), c.get("bytes")
            pp = f"{fl / (ms / 1e3) / PEAK * 100:.1f}%" if fl else "—"
            ph = f"{by / (ms / 1e3) / HBM * 100:.1f}%" if by else "—"
            lines.append(
                f"| {s} | {ms:.2f} | "
                f"{fl:.3e} | {pp} | {by:.3e} | {ph} |" if fl else
                f"| {s} | {ms:.2f} | — | — | — | — |")
        lines.append("")
    (args.out / "SUMMARY.md").write_text("\n".join(lines))
    print(f"\nwrote {args.out}/results.json + SUMMARY.md", flush=True)


if __name__ == "__main__":
    main()
