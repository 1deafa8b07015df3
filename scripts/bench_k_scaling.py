"""K-scaling evidence on the chip (VERDICT r4 item 3): the fused metric
kernels vs the centroid-bank size.

The EP metric axis exists because K grows with the dataset — the reference
retains one centroid per kept observation
(/root/reference/src/lib/src/pythae/models/rhvae/rhvae_model.py:381-422),
and its HMC gradient contraction scales with K
(pythae samplers/manifold_sampler/rhvae_sampler.py:160-187).  This script
measures, on the real chip, where each kernel regime lives:

  - RESIDENT (whole bank VMEM-resident): the round-4 kernels.  Measured
    envelope at D=16: K=2000 compiles only at TB<=128; K=5000 not at all;
    the HMC kernel (two matrix slabs) dies already at K=2000
    (scripts/_probe_k_envelope.py, round 5).
  - CHUNKED (ops/metric_kernels.py _*_kc): grid walks K in 512-wide chunks
    accumulating into VMEM scratch — K-independent VMEM, bank streams from
    HBM.  This run shows where throughput lands as K grows 100x.
  - XLA fallback: the batched-linalg path the auto dispatch would otherwise
    take (~2e5 evals/s at every K — dispatch-floor-bound, not K-bound).

Writes outputs/k_scaling/{results.json,SUMMARY.md}; gated by
tests/test_k_scaling.py.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path(__file__).resolve().parents[1] / "outputs" / "k_scaling"

B = 8192
K_GRID = (200, 2000, 5000, 20000)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def slope_bench(fn, metric, z_np, reps=5, m_inputs=4, **kw):
    """Dispatch-invariant per-call device seconds of ``fn(metric, z)``.

    Round-5 finding (utils/profiling.fori_slope_time): eager-loop timings
    through this harness measure the RPC path, not the kernel — in
    fast-lottery processes ``block_until_ready`` returns before the device
    ran the op (a 13 ms kernel read as 29 us and produced the bogus "flat
    ~3e8 evals/s" first version of this artifact), in others a flat
    ~25-30 ms per-program dispatch cost dominates.  The slope of one
    compiled fori_loop over distinct staged inputs cancels both."""
    import jax.numpy as jnp
    from jax.tree_util import tree_leaves

    from rlvae_tpu.utils.profiling import auto_slope_time

    rng = np.random.default_rng(7)
    zs = jnp.asarray(
        z_np[None] + 0.05 * rng.normal(size=(m_inputs,) + z_np.shape),
        jnp.float32)

    def body(i, acc):
        out = fn(metric, zs[i % m_inputs], **kw)
        return acc + sum(jnp.sum(l).astype(jnp.float32)
                         for l in tree_leaves(out))

    t, _ = auto_slope_time(body, jnp.zeros((), jnp.float32), reps=reps)
    return t


def synthetic(k, d=16, seed=0):
    from rlvae_tpu.geometry.metric import CentroidMetric

    rng = np.random.default_rng(seed)
    c = rng.normal(size=(k, d)).astype(np.float32)
    a = np.eye(d, dtype=np.float32)[None].repeat(k, 0)
    a += 0.1 * rng.normal(size=(k, d, d)).astype(np.float32)
    m = np.einsum("kij,klj->kil", a, a)
    metric = CentroidMetric.create(c, m, temperature=0.5, regularization=0.01)
    idx = rng.integers(0, k, size=B)
    z = c[idx] + 0.1 * rng.normal(size=(B, d)).astype(np.float32)
    return metric, np.asarray(z, np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from rlvae_tpu.geometry.metric import _chol_g_inv_xla
    from rlvae_tpu.ops.metric_kernels import (
        _plan,
        chol_bundle_pallas,
        fused_supported,
        hmc_terms_pallas,
        metric_bundle_pallas,
    )

    dev = str(jax.devices()[0])
    log(f"device: {dev}")
    rows = []
    for k in K_GRID:
        metric, z_np = synthetic(k)
        z = jnp.asarray(z_np)
        tb, kc = _plan(B, 16, k, None)
        tb_hmc, kc_hmc = _plan(B, 16, k, None, n_m=2)
        row = {
            "k": k,
            "batch": B,
            "fused_supported": bool(fused_supported(metric)),
            "plan": {"tb": tb, "kc": kc},
            "plan_hmc": {"tb": tb_hmc, "kc": kc_hmc},
        }
        for name, fn in (
            ("chol_bundle", chol_bundle_pallas),
            ("bundle", metric_bundle_pallas),
            ("hmc_terms", hmc_terms_pallas),
        ):
            t = slope_bench(fn, metric, z_np)
            row[name] = {"s": t, "evals_per_s": B / t}
            log(f"K={k:6d} {name:12s}: {t * 1e6:9.1f} us -> {B / t:.3e} evals/s")
        # XLA fallback materializes [B, K, D]-broadcast intermediates, so at
        # large K it OOMs single-chip HBM outright (measured: 19.5 GB asked
        # of 15.75 GB at K=20000, B=8192) — degrade the arm's batch until it
        # fits and compare RATES; record the largest batch that ran.
        b_xla, t_xla = B, None
        while b_xla >= 128:
            try:
                t_xla = slope_bench(_chol_g_inv_xla, metric,
                                    z_np[:b_xla], reps=3)
                break
            except Exception as e:  # noqa: BLE001 — XLA OOM is a RuntimeError
                log(f"K={k:6d} xla_chol    : OOM at B={b_xla} "
                    f"({str(e).splitlines()[0][:80]}); halving")
                b_xla //= 2
        if t_xla is None:
            row["xla_chol"] = {"oom_at_all_batches": True}
            row["fused_vs_xla"] = float("inf")
        else:
            rate = b_xla / t_xla
            row["xla_chol"] = {
                "s": t_xla, "evals_per_s": rate, "batch": b_xla,
                "oom_at_full_batch": b_xla != B,
            }
            row["fused_vs_xla"] = row["chol_bundle"]["evals_per_s"] / rate
            log(
                f"K={k:6d} xla_chol    : {t_xla * 1e6:9.1f} us @B={b_xla} -> "
                f"{rate:.3e} evals/s (fused {row['fused_vs_xla']:.0f}x)"
            )
        rows.append(row)

    # regime A/B at K=2000: clamped-resident TB=128 vs forced-chunked TB=512
    metric, z_np = synthetic(2000)
    z = jnp.asarray(z_np)
    t_res = slope_bench(chol_bundle_pallas, metric, z_np, tb=128)
    t_kc = slope_bench(chol_bundle_pallas, metric, z_np, tb=512)
    regime_ab = {
        "k": 2000,
        "resident_tb128_s": t_res,
        "chunked_tb512_s": t_kc,
        "chunked_vs_resident": t_res / t_kc,
    }
    log(
        f"K=2000 regime A/B: resident tb=128 {t_res * 1e6:.1f} us, "
        f"chunked tb=512 {t_kc * 1e6:.1f} us "
        f"({t_res / t_kc:.2f}x)"
    )

    OUT.mkdir(parents=True, exist_ok=True)
    results = {"device": dev, "batch": B, "rows": rows, "regime_ab": regime_ab}
    (OUT / "results.json").write_text(json.dumps(results, indent=2))

    k20 = rows[-1]
    lines = [
        "# Fused metric kernels vs centroid-bank size (real chip)",
        "",
        f"Device: {dev}.  Batch {B}, D=16; per-call times are fori-loop "
        "SLOPES inside one compiled program (dispatch-invariant, distinct "
        "staged inputs — utils/profiling.auto_slope_time), median-of-reps "
        "within one process.",
        "",
        "| K | plan (tb/kc) | chol evals/s | bundle evals/s | hmc evals/s | fused vs XLA |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        p = r["plan"]
        plan = f"{p['tb']}/{p['kc'] or 'resident'}"
        lines.append(
            f"| {r['k']} | {plan} | {r['chol_bundle']['evals_per_s']:.2e} "
            f"| {r['bundle']['evals_per_s']:.2e} "
            f"| {r['hmc_terms']['evals_per_s']:.2e} "
            f"| {r['fused_vs_xla']:.0f}x |"
        )
    lines += [
        "",
        "The round-4 RESIDENT kernels' real envelope (measured, "
        "scripts/_probe_k_envelope.py): K=2000 compiled only at TB<=128, "
        "K=5000 not at all, and the HMC kernel (two [D^2, K] slabs) failed "
        "already at K=2000 — `fused_supported` overstated support by ~5x. "
        "The K-CHUNKED kernels (round 5) stream the bank from HBM through a "
        "second grid axis with VMEM scratch accumulation, making VMEM use "
        "K-independent: every K above now runs fused, and the auto plan "
        "(`_plan`) picks the regime from the measured envelope.",
        "",
        f"At K=20,000 (100x the flagship bank) the chol bundle still runs "
        f"{k20['fused_vs_xla']:.0f}x faster than the XLA fallback "
        f"({k20['chol_bundle']['evals_per_s']:.2e} vs "
        f"{k20['xla_chol'].get('evals_per_s', 0):.2e} evals/s"
        + (f", and the XLA arm only fits at B={k20['xla_chol']['batch']} — "
           f"at the fused arm's B={B} it OOMs single-chip HBM outright, "
           "19.5 GB of [B, K, D]-broadcast intermediates asked of 15.75 GB"
           if k20["xla_chol"].get("oom_at_full_batch") else "")
        + "). The dense "
        "single-chip path no longer *breaks* at large K — it stays fused and "
        "HBM-streamed; the EP-sharded bank (parallel/metric_parallel.py) "
        "remains the capacity/throughput axis once the bank or its traffic "
        "outgrows one chip's HBM.",
        "",
        f"Regime A/B at K=2000: chunked TB=512 vs clamped-resident TB=128 = "
        f"{regime_ab['chunked_vs_resident']:.2f}x "
        "(auto plan keeps whichever the envelope allows; explicit TB "
        "overrides route out-of-envelope shapes to the chunked kernel "
        "instead of failing Mosaic allocation).",
    ]
    (OUT / "SUMMARY.md").write_text("\n".join(lines) + "\n")
    log(f"wrote {OUT}/results.json and SUMMARY.md")


if __name__ == "__main__":
    main()
