"""Validates the committed generation-quality parity artifact.

Round-2 VERDICT item 4: compare GENERATED SAMPLES (official RHVAE prior
chain -> decode, shared weights) between this framework and the torch
reference.  outputs/generation_parity/summary.json is produced by
scripts/generation_parity.py (n=256 chains, 100x15 tempered leapfrog,
centroid starts, the repo's pretrained metric + decoder on both sides).

Recorded 2026-08-17: Fréchet ours-vs-torch 0.83 pixel / 0.48 encoder space,
vs a 0.54 / 0.28 torch-seed-to-seed noise floor and 4.08 / 2.55 against
decoded N(0, 4I) latents; accept rate 0.047 vs 0.049; mean final log pi
3.87 vs 4.08 (seed spread 3.69-4.08).

NB: an ARTIFACT gate (the torch chain takes minutes-to-tens-of-minutes on
this 1-core host) — the committed summary carries a ``generated_at_commit``
provenance field; regenerate with the script after touching the HMC chain,
metric, or decoder math.
"""

import json
from pathlib import Path

import pytest

ART = Path(__file__).resolve().parents[1] / "outputs" / "generation_parity"


@pytest.fixture(scope="module")
def summary():
    if not (ART / "summary.json").exists():
        pytest.skip("generation-parity artifact not present "
                    "(scripts/generation_parity.py)")
    return json.loads((ART / "summary.json").read_text())


def test_chain_statistics_match(summary):
    """Accept rate within 0.02 absolute; mean final log pi inside (a small
    margin beyond) the torch seed spread."""
    ours = summary["chain_stats"]["ours"]
    t0 = summary["chain_stats"]["torch_seed0"]
    t1 = summary["chain_stats"]["torch_seed1"]
    assert abs(ours["accept_rate"] - t0["accept_rate"]) < 0.02
    lo = min(t0["log_pi_mean"], t1["log_pi_mean"])
    hi = max(t0["log_pi_mean"], t1["log_pi_mean"])
    spread = max(hi - lo, 0.2)
    assert lo - spread <= ours["log_pi_mean"] <= hi + spread


def test_frechet_close_to_seed_floor(summary):
    """FD(ours, torch) within 2x the torch seed-to-seed sampling floor in
    both feature spaces — the two samplers draw from the same distribution."""
    fd = summary["frechet"]
    assert fd["pixel_ours_vs_torch"] < 2.0 * fd["pixel_torch_seed_floor"]
    assert fd["encoder_ours_vs_torch"] < 2.0 * fd["encoder_torch_seed_floor"]


def test_frechet_far_below_scale_reference(summary):
    """...and far below the decoded-wide-Gaussian scale reference, so the
    floor comparison is not vacuous."""
    fd = summary["frechet"]
    assert fd["pixel_ours_vs_torch"] < 0.33 * fd["pixel_torch_vs_random_latents"]
    assert fd["encoder_ours_vs_torch"] < 0.33 * fd["encoder_torch_vs_random_latents"]
