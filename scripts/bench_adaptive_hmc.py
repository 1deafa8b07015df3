#!/usr/bin/env python
"""Adaptive-HMC vs the parity-exact official chain: ESS/sec + sample quality.

Round-3 VERDICT item 2 ("beat, don't just match"): the reference's prior
sampler runs a FIXED eps=0.03 chain that accepts ~4.7% of proposals on the
real pre-trained metric (pythae rhvae_sampler_config.py:24-27 defaults;
outputs/generation_parity/summary.json) — 95% of its leapfrog work is
wasted.  samplers/hmc.py:run_adaptive_prior_chain adds dual-averaging
step-size adaptation (Hoffman & Gelman 2014 §3.2) targeting 0.65
acceptance, per-chain.  This script publishes the head-to-head at an EQUAL
compute budget (same chains x mcmc_steps x n_lf leapfrog integrations,
same fused-kernel terms backend, same device):

- wall-clock per run (jitted, warmed, median of reps),
- post-warmup ESS (utils/mcmc.py: Geyer initial-monotone-sequence per
  chain/dim, summed over chains, min over dims) and ESS/sec,
- acceptance rates,
- sample quality: Fréchet distance of each sampler's decoded draws against
  a long gold-standard chain (10x steps, adaptive, thinned), in pixel and
  trained-encoder feature space (utils/fid.py) — "more effective samples"
  must also mean "at least as close to the target distribution".

Writes outputs/adaptive_hmc/summary.json; tests/test_adaptive_hmc.py gates
the committed artifact.

Usage: python scripts/bench_adaptive_hmc.py [--n 256] [--steps 100]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def timed(fn, *args, reps=3):
    """Median wall-clock of a jitted, warmed callable (block_until_ready)."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return out, float(np.median(ts))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256, help="chains")
    ap.add_argument("--steps", type=int, default=100, help="MCMC steps")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=str(ROOT / "outputs" / "adaptive_hmc"))
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from rlvae_tpu.geometry import load_metric
    from rlvae_tpu.models import RlVAE
    from rlvae_tpu.samplers import (
        HMCConfig,
        sample_prior_hmc,
        sample_prior_hmc_adaptive,
    )
    from rlvae_tpu.samplers.hmc import _terms_fn, draw_chain_noise, run_prior_chain
    from rlvae_tpu.utils.fid import encoder_features, fid_score, pixel_features
    from rlvae_tpu.utils.mcmc import effective_sample_size

    metric = load_metric(ROOT / "data" / "pretrained" / "metric.npz")
    d = metric.latent_dim
    warmup = args.steps // 2
    cfg = HMCConfig(mcmc_steps=args.steps, n_lf=15, init="centroids")
    print(f"device: {jax.devices()[0]}  chains={args.n} steps={args.steps} "
          f"n_lf={cfg.n_lf} warmup={warmup}", file=sys.stderr)

    # shared starting positions + noise stream sizes => equal budget
    terms = _terms_fn(metric, cfg.backend)
    key = jax.random.PRNGKey(0)
    k_init, k_off, k_ad = jax.random.split(key, 3)
    idx = jax.random.randint(k_init, (args.n,), 0, metric.n_centroids)
    z0 = metric.centroids[idx]

    # -- official chain (parity-exact math, states collected) ---------------
    @jax.jit
    def official(z0):
        gammas, unifs = draw_chain_noise(k_off, args.steps, args.n, d)
        return run_prior_chain(terms, z0, gammas, unifs, cfg,
                               collect_states=True)

    (z_off, rate_off, _, zs_off), t_off = timed(official, z0, reps=args.reps)

    # -- adaptive chain (dual averaging -> 0.65 target, per-chain eps) ------
    @jax.jit
    def adaptive(z0):
        return sample_prior_hmc_adaptive(
            metric, k_ad, args.n, cfg, warmup=warmup, z0=z0, return_chain=True
        )

    (zs_ad, diag_ad), t_ad = timed(adaptive, z0, reps=args.reps)
    z_ad = zs_ad[-1]

    # -- ESS on the post-warmup halves (equal footing) -----------------------
    ess_off = effective_sample_size(np.asarray(zs_off[warmup:]))
    ess_ad = effective_sample_size(np.asarray(zs_ad[warmup:]))
    eps_ad = np.asarray(diag_ad["eps_final"])
    print(
        f"official: {t_off:.3f}s accept={float(rate_off):.3f} ESS={ess_off:.1f}"
        f" -> {ess_off / t_off:.1f} ESS/s", file=sys.stderr)
    print(
        f"adaptive: {t_ad:.3f}s accept={float(diag_ad['accept_rate']):.3f} "
        f"ESS={ess_ad:.1f} -> {ess_ad / t_ad:.1f} ESS/s "
        f"(eps {eps_ad.min():.4f}..{eps_ad.max():.4f})", file=sys.stderr)

    # -- sample quality vs a long gold-standard chain ------------------------
    # 10x-step adaptive run; post-warmup draws thinned to n decorrelated
    # samples form the target-distribution stand-in
    gold_steps = 10 * args.steps
    gold_cfg = HMCConfig(mcmc_steps=gold_steps, n_lf=15, init="centroids")
    zs_gold, _ = jax.jit(
        lambda z0: sample_prior_hmc_adaptive(
            metric, jax.random.PRNGKey(7), args.n, gold_cfg,
            warmup=gold_steps // 2, z0=z0, return_chain=True,
        )
    )(z0)
    post = np.asarray(zs_gold[gold_steps // 2 :])  # [S/2, B, D]
    stride = max(1, post.shape[0] * post.shape[1] // args.n)
    z_gold = post.reshape(-1, d)[::stride][: args.n]

    model = RlVAE(
        input_dim=(3, 64, 64), latent_dim=16, n_flows=0,
        posterior_type="gaussian", sampling_method="standard",
        use_riemannian=False,
        encoder_config={"dtype": "float32"}, decoder_config={"dtype": "float32"},
    )
    variables = model.init(jax.random.PRNGKey(1))
    variables = model.load_pretrained_components(
        variables,
        encoder_path=ROOT / "data" / "pretrained" / "encoder.npz",
        decoder_path=ROOT / "data" / "pretrained" / "decoder.npz",
    )

    def decode(z):
        out, _ = model.decode(variables, jnp.asarray(z))
        return np.asarray(out.reconstruction)

    def enc(x):
        out, _ = model.encode(variables, jnp.asarray(x))
        return np.asarray(out.embedding)

    x_off, x_ad, x_gold = decode(z_off), decode(z_ad), decode(np.asarray(z_gold))
    fd = {
        "pixel_official_vs_gold": fid_score(
            pixel_features(x_gold), pixel_features(x_off)),
        "pixel_adaptive_vs_gold": fid_score(
            pixel_features(x_gold), pixel_features(x_ad)),
        "encoder_official_vs_gold": fid_score(
            encoder_features(enc, x_gold), encoder_features(enc, x_off)),
        "encoder_adaptive_vs_gold": fid_score(
            encoder_features(enc, x_gold), encoder_features(enc, x_ad)),
    }
    print(f"frechet vs gold: {fd}", file=sys.stderr)

    try:
        commit = subprocess.run(
            ["git", "-C", str(ROOT), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        commit = "unknown"
    summary = {
        "device": str(jax.devices()[0]),
        "generated_at_commit": commit,
        "budget": {"chains": args.n, "mcmc_steps": args.steps,
                   "n_lf": cfg.n_lf, "warmup": warmup,
                   "leapfrog_integrations": args.n * args.steps * cfg.n_lf},
        "official": {
            "wall_s": round(t_off, 4),
            "accept_rate": round(float(rate_off), 4),
            "ess_post_warmup": round(ess_off, 2),
            "ess_per_sec": round(ess_off / t_off, 2),
        },
        "adaptive": {
            "wall_s": round(t_ad, 4),
            "accept_rate": round(float(diag_ad["accept_rate"]), 4),
            "ess_post_warmup": round(ess_ad, 2),
            "ess_per_sec": round(ess_ad / t_ad, 2),
            "eps_tuned_min": round(float(eps_ad.min()), 5),
            "eps_tuned_max": round(float(eps_ad.max()), 5),
        },
        "ess_per_sec_ratio": round((ess_ad / t_ad) / (ess_off / t_off), 2),
        "frechet_vs_gold": {k: round(float(v), 4) for k, v in fd.items()},
    }
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
