"""Validates the committed adaptive-HMC head-to-head artifact.

Round-3 VERDICT item 2 ("beat, don't just match"): the reference's prior
chain runs a fixed eps=0.03 and accepts ~4.7% of proposals on the real
metric — outputs/adaptive_hmc/summary.json is produced by
scripts/bench_adaptive_hmc.py and compares the dual-averaging adaptive
chain (samplers/hmc.py:run_adaptive_prior_chain) against the parity-exact
official chain at an EQUAL leapfrog budget on the same device.

NB: an ARTIFACT gate (chains + FID run minutes on device) — regenerate with
the script after touching the HMC chain or the metric math; the summary
carries ``generated_at_commit`` provenance.
"""

import json
from pathlib import Path

import pytest

ART = Path(__file__).resolve().parents[1] / "outputs" / "adaptive_hmc"


@pytest.fixture(scope="module")
def summary():
    if not (ART / "summary.json").exists():
        pytest.skip("adaptive-HMC artifact not present "
                    "(scripts/bench_adaptive_hmc.py)")
    return json.loads((ART / "summary.json").read_text())


def test_equal_budget(summary):
    """The matched comparison is honest: the adaptive arm's total leapfrog
    spend (3-phase warmup + sampling) fits inside the official budget."""
    b = summary["budget"]
    assert b["leapfrog_integrations"] == b["chains"] * b["mcmc_steps"] * b["n_lf"]
    assert b["adaptive_leapfrog_spent"] <= b["leapfrog_integrations"]


def test_adaptation_hits_target_band(summary):
    """Dual averaging (re-tuned at the sampling trajectory length) lands in
    a usable acceptance band where the official chain wastes ~95% of its
    proposals."""
    assert summary["official"]["accept_rate"] < 0.15
    assert 0.35 < summary["adaptive"]["accept_rate"] < 0.95
    assert 0.35 < summary["adaptive_tpu"]["accept_rate"] < 0.95
    assert summary["adaptive"]["eps_tuned_min"] > 0.0


def test_not_worse_at_equal_budget(summary):
    """Algorithmic head-to-head (same chains, same leapfrog budget, honest
    Geyer ESS): the tuned chain must not lose to the mis-tuned official one.
    On this target the honest win is modest — the guarded RHVAE density is
    narrow wells on a gradient-free plateau, so most ESS comes from the
    independently-initialized chains (see the script docstring)."""
    assert summary["ess_per_sec_ratio_equal_budget"] >= 1.0, (
        summary["ess_per_sec_ratio_equal_budget"])


def test_ess_per_sec_dominates(summary):
    """The VERDICT bar: >= 10x effective samples per second at equal
    DISPATCH (one chain run per arm — NOT equal wall-clock; the artifact's
    wall_vs_official records the premium) — the adaptive mode is free to
    shape the chain count to the device (the official parity chain's
    [256, 16] shape leaves the MXU ~99% idle), but must pay at most a
    modest wall-clock premium for it."""
    assert summary["ess_per_sec_ratio"] >= 10.0, summary["ess_per_sec_ratio"]
    assert summary["adaptive_tpu"]["wall_vs_official"] <= 1.55, (
        summary["adaptive_tpu"]["wall_vs_official"])


def test_calibration_breakeven_stated(summary):
    """The one-time calibration cost is huge relative to one sampling run
    (~1800x); the artifact must state when it amortizes, and the number must
    be reproducible from the artifact's own rates (the serving plan cache —
    tests/test_serving.py — is what delivers that amortization)."""
    be = summary["calibration_breakeven"]
    t_cal = summary["adaptive_tpu"]["calibration_s"]
    r_off = summary["official"]["ess_per_sec"]
    r_big = summary["adaptive_tpu"]["ess_per_sec"]
    e_star = t_cal / (1.0 / r_off - 1.0 / r_big)
    assert abs(be["ess_total"] - e_star) / e_star < 0.01
    assert be["adaptive_requests"] >= 1
    assert (be["adaptive_requests"] - 1) * summary["adaptive_tpu"][
        "ess_post_warmup"] < e_star <= be["adaptive_requests"] * summary[
        "adaptive_tpu"]["ess_post_warmup"]


def test_sample_quality_not_worse(summary):
    """More effective samples must not mean worse samples: each adaptive
    arm's decoded draws sit at least as close to the long gold-standard
    chain as the official chain's, within the Fréchet estimator's measured
    noise (the script runs TWO independent gold chains; their seed-to-seed
    distance is the floor — even two exact samplers land ~floor apart at
    this sample count, so the margin is floor-aware rather than a bare
    multiple)."""
    fd = summary["frechet_vs_gold"]
    floor = summary["frechet_gold_seed_floor"]

    def cap(space):
        off = fd[f"{space}_official_vs_gold"]
        return max(1.5 * off, off + 1.5 * floor[space])

    assert fd["pixel_adaptive_vs_gold"] <= cap("pixel")
    assert fd["encoder_adaptive_vs_gold"] <= cap("encoder")
    assert fd["pixel_adaptive_tpu_vs_gold"] <= cap("pixel")
    assert fd["encoder_adaptive_tpu_vs_gold"] <= cap("encoder")
