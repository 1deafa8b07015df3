#!/usr/bin/env python
"""Adaptive-HMC vs the parity-exact official chain: ESS/sec + sample quality.

Round-3 VERDICT item 2 ("beat, don't just match"): the reference's prior
sampler runs a FIXED eps=0.03 chain that accepts ~4.7% of proposals on the
real pre-trained metric (pythae rhvae_sampler_config.py:24-27 defaults;
outputs/generation_parity/summary.json).  samplers/hmc.py adds a budgeted
adaptive mode (sample_prior_hmc_adaptive_budget): dual-averaging step-size
adaptation (Hoffman & Gelman 2014 §3.2) re-tuned at the sampling trajectory
length, path-length-preserving n_lf, per-chain eps, step-size jitter.

Two head-to-heads, reported separately and honestly:

1. EQUAL LEAPFROG BUDGET, same chain count (algorithmic comparison): on
   this target the win is modest — the guarded RHVAE density is a set of
   narrow wells on a gradient-free plateau (log(sqrt(det)+1e-10), the
   pythae quirk: chains are metastable around centroids and most ESS comes
   from the 256 independently-initialized chains, not from within-chain
   mixing; the official chain's rare accepted moves are long and
   decorrelate well).  The gate is "not worse": ratio >= 1.0.

2. EQUAL WALL-CLOCK, device used properly (the TPU-first comparison): the
   official chain's shape [256 chains x 16] leaves the MXU ~99% idle — the
   fused terms kernel's throughput scales ~400x from B=64 to B=65k
   (BENCH_r03).  The adaptive mode is a config knob away from running
   thousands of tuned chains in the SAME wall-clock; post-warmup states of
   independent chains are independent samples.  The gate is the VERDICT
   bar: >= 10x ESS/sec at <= ~1.25x the official wall-clock.

Also reported: honest Geyer ESS (utils/mcmc.py — a frozen chain now counts
as 1 effective sample, not n; the first run of this artifact was inflated
4x by that bug), acceptance rates, and sample quality (Fréchet distance of
each arm's decoded draws against a long gold-standard chain, pixel +
trained-encoder feature space, utils/fid.py) — more effective samples must
also mean "at least as close to the target".

Writes outputs/adaptive_hmc/summary.json; tests/test_adaptive_hmc.py gates
the committed artifact.

Usage: python scripts/bench_adaptive_hmc.py [--n 256] [--steps 100]
           [--n-tpu 8192]
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
    ap.add_argument("--n-tpu", type=int, default=32768,
                    help="chain-count cap for the equal-wall-clock TPU arm")
    ap.add_argument("--gen-steps", type=int, default=12,
                    help="MCMC steps per planned generation chain")
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
        sample_prior_hmc_adaptive_budget,
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

    # -- adaptive arms: budgeted three-phase plan (samplers/hmc.py:
    # sample_prior_hmc_adaptive_budget — phase A rough-tunes eps at short
    # trajectories, phase B re-tunes AT the sampling n_lf, phase C samples at
    # fixed tuned eps with jitter), re-orchestrated here under script-level
    # jit so wall-clock excludes tracing ------------------------------------
    from rlvae_tpu.samplers.hmc import (
        ADAPTIVE_EPS_JITTER,
        ADAPTIVE_NLF_A,
        ADAPTIVE_TARGET,
        ADAPTIVE_TARGET_A,
        ADAPTIVE_WARMUP_A,
        adaptive_warmup_b_steps,
        run_adaptive_prior_chain,
        run_hmc_chain_fixed,
    )

    budget = args.steps * cfg.n_lf
    lam = cfg.n_lf * cfg.eps_lf
    wa, nlw = ADAPTIVE_WARMUP_A, ADAPTIVE_NLF_A
    wb = adaptive_warmup_b_steps(wa)

    def make_matched_runner(n_chains, z0_init, key):
        """The full budgeted 3-phase pipeline FUSED into one jitted program
        (the sampling n_lf is decided by one un-timed calibration call, then
        baked in as a static constant — exactly how repeated production
        sampling behaves).  Returns (run, plan)."""
        k_a, k_b, k_s, k_j = jax.random.split(key, 4)
        acfg = HMCConfig(mcmc_steps=wa, n_lf=nlw, init="centroids")

        def phase_a(z0):
            g, u = draw_chain_noise(k_a, wa, n_chains, d)
            return run_adaptive_prior_chain(
                terms, z0, g, u, acfg,
                target_accept=ADAPTIVE_TARGET_A, warmup=wa, per_chain=True)

        _, diag_a0 = jax.jit(phase_a)(z0_init)  # un-timed: decides static n_lf
        eps_med = float(jnp.median(diag_a0["eps_final"]))
        n_lf_s = int(np.clip(round(lam / eps_med), 2, 128))
        bcfg = HMCConfig(mcmc_steps=wb, n_lf=n_lf_s, init="centroids")
        spent_warm = wa * nlw + wb * n_lf_s
        steps_s = max(1, (budget - spent_warm) // n_lf_s)

        @jax.jit
        def run(z0):
            zs_a, diag_a = phase_a(z0)
            g, u = draw_chain_noise(k_b, wb, n_chains, d)
            zs_b, diag_b = run_adaptive_prior_chain(
                terms, zs_a[-1], g, u, bcfg,
                target_accept=ADAPTIVE_TARGET, warmup=wb, per_chain=True,
                eps_init=diag_a["eps_final"])
            g_s, u_s = draw_chain_noise(k_s, steps_s, n_chains, d)
            jitters = 1.0 + ADAPTIVE_EPS_JITTER * (
                2.0 * jax.random.uniform(k_j, (steps_s, n_chains)) - 1.0)
            zs, rate, _ = run_hmc_chain_fixed(
                terms, zs_b[-1], g_s, u_s, diag_b["eps_final"], n_lf_s,
                jitters)
            return zs, rate, diag_b["eps_final"]

        plan = {"n_lf_sampling": n_lf_s, "steps_sampling": steps_s,
                "lf_spent": spent_warm + steps_s * n_lf_s,
                "eps_med_phase_a": eps_med}
        return run, plan

    # arm 1: EQUAL BUDGET, same chain count (algorithmic head-to-head;
    # warmup cost inside the budget)
    run_eq, plan_eq = make_matched_runner(args.n, z0, k_ad)
    print(f"adaptive plan (matched): n_lf={plan_eq['n_lf_sampling']} "
          f"steps={plan_eq['steps_sampling']} "
          f"(lf {plan_eq['lf_spent']}/{budget})", file=sys.stderr)
    (zs_ad, rate_ad, eps_ad), t_ad = timed(run_eq, z0, reps=args.reps)
    z_ad = zs_ad[-1]
    rate_ad = float(rate_ad)

    # arm 2: the TPU operating point — calibrate ONCE per metric (cost
    # reported, amortizes like a compile cache), then generation is one
    # fixed-eps program; chain count grows until wall-clock matches the
    # official run's (the fused terms kernel scales ~linearly in batch)
    from rlvae_tpu.samplers import calibrate_adaptive_plan, sample_prior_hmc_planned

    t0_cal = time.perf_counter()
    plan_tpu = calibrate_adaptive_plan(metric, jax.random.PRNGKey(12), cfg,
                                       pool_size=args.n_tpu)
    jax.block_until_ready(plan_tpu["pool"])
    t_cal = time.perf_counter() - t0_cal
    gen_steps = args.gen_steps

    n_big, t_big, zs_big, rate_big = args.n, None, None, None
    for cand in (1024, 2048, 4096, 8192, 16384, 32768):  # <= pool size
        if cand > args.n_tpu:
            break
        run_c = jax.jit(lambda key, c=cand: sample_prior_hmc_planned(
            metric, key, c, plan_tpu, steps=gen_steps, config=cfg,
            return_chain=True))
        (zs_c, diag_c), t_c = timed(run_c, jax.random.PRNGKey(13), reps=args.reps)
        print(f"  planned B={cand}: {t_c*1e3:.1f} ms "
              f"accept={float(diag_c['accept_rate']):.3f}", file=sys.stderr)
        if t_c <= 1.5 * t_off or zs_big is None:
            n_big, t_big, zs_big = cand, t_c, zs_c
            rate_big = float(diag_c["accept_rate"])
        if t_c > 1.5 * t_off:
            break

    # -- honest Geyer ESS (frozen chain = 1 effective sample) ----------------
    ess_off = effective_sample_size(np.asarray(zs_off[warmup:]))
    ess_ad = effective_sample_size(np.asarray(zs_ad))
    ess_big = effective_sample_size(np.asarray(zs_big))
    eps_ad = np.asarray(eps_ad)
    print(
        f"official: {t_off:.3f}s accept={float(rate_off):.3f} ESS={ess_off:.1f}"
        f" -> {ess_off / t_off:.1f} ESS/s", file=sys.stderr)
    print(
        f"adaptive matched (B={args.n}): {t_ad:.3f}s accept={rate_ad:.3f} "
        f"ESS={ess_ad:.1f} -> {ess_ad / t_ad:.1f} ESS/s "
        f"(eps {eps_ad.min():.4f}..{eps_ad.max():.4f})", file=sys.stderr)
    print(
        f"adaptive tpu (B={n_big}, {gen_steps} steps, calibration {t_cal:.2f}s"
        f" amortized): {t_big:.3f}s accept={rate_big:.3f} "
        f"ESS={ess_big:.1f} -> {ess_big / t_big:.1f} ESS/s", file=sys.stderr)

    # -- sample quality vs a long gold-standard chain ------------------------
    # 10x-step adaptive run; post-warmup draws thinned to n decorrelated
    # samples form the target-distribution stand-in
    def gold_draws(seed):
        zs_g, _ = sample_prior_hmc_adaptive_budget(
            metric, jax.random.PRNGKey(seed), args.n, cfg,
            budget_lf=10 * budget, warmup=100, z0=z0, return_chain=True,
        )
        post = np.asarray(zs_g)  # all post-warmup [S, B, D]
        stride = max(1, post.shape[0] * post.shape[1] // args.n)
        return post.reshape(-1, d)[::stride][: args.n]

    # two independent gold runs: the second calibrates the Fréchet
    # estimator's seed-to-seed noise floor at this sample count
    z_gold, z_gold2 = gold_draws(7), gold_draws(8)

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

    # TPU-shaped arm's deliverable: final states of args.n random chains
    pick = np.random.default_rng(13).choice(n_big, args.n, replace=False)
    z_big = np.asarray(zs_big[-1])[pick]

    x_off, x_ad, x_gold = decode(z_off), decode(z_ad), decode(np.asarray(z_gold))
    x_big = decode(z_big)
    x_gold2 = decode(np.asarray(z_gold2))
    pf_gold, ef_gold = pixel_features(x_gold), encoder_features(enc, x_gold)
    fd_floor = {
        "pixel": fid_score(pf_gold, pixel_features(x_gold2)),
        "encoder": fid_score(ef_gold, encoder_features(enc, x_gold2)),
    }
    print(f"gold seed-to-seed floor: {fd_floor}", file=sys.stderr)
    fd = {
        "pixel_official_vs_gold": fid_score(pf_gold, pixel_features(x_off)),
        "pixel_adaptive_vs_gold": fid_score(pf_gold, pixel_features(x_ad)),
        "pixel_adaptive_tpu_vs_gold": fid_score(pf_gold, pixel_features(x_big)),
        "encoder_official_vs_gold": fid_score(
            ef_gold, encoder_features(enc, x_off)),
        "encoder_adaptive_vs_gold": fid_score(
            ef_gold, encoder_features(enc, x_ad)),
        "encoder_adaptive_tpu_vs_gold": fid_score(
            ef_gold, encoder_features(enc, x_big)),
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
                   "leapfrog_integrations": args.n * args.steps * cfg.n_lf,
                   "adaptive_leapfrog_spent": args.n * plan_eq["lf_spent"]},
        "official": {
            "wall_s": round(t_off, 4),
            "accept_rate": round(float(rate_off), 4),
            "ess_post_warmup": round(ess_off, 2),
            "ess_per_sec": round(ess_off / t_off, 2),
        },
        "adaptive": {
            "wall_s": round(t_ad, 4),
            "accept_rate": round(rate_ad, 4),
            "ess_post_warmup": round(ess_ad, 2),
            "ess_per_sec": round(ess_ad / t_ad, 2),
            "eps_tuned_min": round(float(eps_ad.min()), 5),
            "eps_tuned_max": round(float(eps_ad.max()), 5),
            "warmup_steps": wa,
            "n_lf_warmup": nlw,
            "warmup_b_steps": wb,
            "n_lf_sampling": plan_eq["n_lf_sampling"],
            "steps_sampling": plan_eq["steps_sampling"],
            "path_length": round(lam, 4),
        },
        "adaptive_tpu": {
            "chains": n_big,
            "wall_s": round(t_big, 4),
            "accept_rate": round(rate_big, 4),
            "ess_post_warmup": round(ess_big, 2),
            "ess_per_sec": round(ess_big / t_big, 2),
            "n_lf_sampling": int(plan_tpu["n_lf"]),
            "steps_sampling": gen_steps,
            "leapfrog_spent": n_big * gen_steps * int(plan_tpu["n_lf"]),
            "calibration_s": round(t_cal, 3),
            "calibration_lf": int(plan_tpu["calibration_lf"]),
            "wall_vs_official": round(t_big / t_off, 3),
        },
        # algorithmic head-to-head at EQUAL budget + chains (gate: >= 1.0)
        "ess_per_sec_ratio_equal_budget": round(
            (ess_ad / t_ad) / (ess_off / t_off), 2),
        # the TPU-first operating point at EQUAL DISPATCH (one chain run per
        # arm; the adaptive arm spends wall_vs_official x the wall for its
        # ESS/sec edge — NOT equal wall-clock; gate: >= 10)
        "ess_per_sec_ratio": round((ess_big / t_big) / (ess_off / t_off), 2),
        "frechet_vs_gold": {k: round(float(v), 4) for k, v in fd.items()},
        "frechet_gold_seed_floor": {k: round(float(v), 4)
                                    for k, v in fd_floor.items()},
    }
    # Calibration amortization: the 3-phase tuning is paid ONCE and cached
    # as a plan (rlvae_tpu/inference.py adaptive_plan cache; the serving
    # engine reuses it for every generate request).  Break-even vs the
    # official chain at equal TOTAL effective samples:
    #   t_cal + E / (ESS/s)_adaptive = E / (ESS/s)_official
    rate_off_s, rate_big_s = ess_off / t_off, ess_big / t_big
    if rate_big_s > rate_off_s:
        e_star = t_cal / (1.0 / rate_off_s - 1.0 / rate_big_s)
        summary["calibration_breakeven"] = {
            "ess_total": round(e_star, 0),
            "adaptive_requests": int(np.ceil(e_star / ess_big)),
            "official_requests_equiv": int(np.ceil(e_star / ess_off)),
            "note": "one cached calibration pays for itself once total "
                    "demanded ESS exceeds ess_total (adaptive_requests "
                    "generate dispatches); below that, use the official "
                    "chain or an uncached adaptive run",
        }
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
