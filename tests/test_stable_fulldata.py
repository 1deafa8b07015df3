"""Validates the committed stable-vs-reference full_data artifact.

Round-3 VERDICT item 3: the stable preset's "bounded AND at least as good"
claim must be measured at the reference's production scale
(conf/training/full_data.yaml: 50 epochs, 5000 sequences, batch 8), not
just quick config.  outputs/stable_vs_reference_fulldata/results.json is
produced by scripts/stable_vs_reference_fulldata.py on the TPU.

NB: an ARTIFACT gate (two 50-epoch runs + generation FID, tens of minutes
on the chip) — regenerate with the script after touching the flagship
objective, flows, or trainer math; carries ``generated_at_commit``.
"""

import json
from pathlib import Path

import pytest

ART = (Path(__file__).resolve().parents[1]
       / "outputs" / "stable_vs_reference_fulldata")


@pytest.fixture(scope="module")
def results():
    if not (ART / "results.json").exists():
        pytest.skip("full_data stable-vs-reference artifact not present "
                    "(scripts/stable_vs_reference_fulldata.py)")
    return json.loads((ART / "results.json").read_text())


def test_scale_is_fulldata(results):
    s = results["scale"]
    assert s["epochs"] >= 50 and s["n_train_samples"] >= 5000


def test_stable_bounds_latents(results):
    """The reference objective explodes latents at scale; the stable preset
    keeps them O(10)."""
    sm = results["shared_metrics"]["latent_norm"]
    assert sm["stable"] < 100.0, sm
    assert results["latent_norm_ratio_ref_over_stable"] > 10.0


def test_stable_at_least_as_good(results):
    """Reconstruction and generation FID: stable <= reference (small margin
    for run-to-run noise) — 'bounded and at least as good', measured."""
    sm = results["shared_metrics"]
    assert sm["recon_loss"]["stable"] <= 1.05 * sm["recon_loss"]["reference"]
    g = results["generation"]
    assert (g["stable"]["encoder_fid_vs_data"]
            <= 1.10 * g["reference"]["encoder_fid_vs_data"])


def test_sequence_generation_differentiates_flows(results):
    """VERDICT r4 item 4: the z0-only generation rows decode arm-identical
    latents (decoders only).  The sequence rows run each ARM'S OWN flows —
    the component the stable preset changes — and must exist, be finite,
    and show the stable arm at least as good on the frame-marginal FID
    while keeping its flow-evolved latents bounded."""
    sg = results["sequence_generation"]
    for arm in ("reference", "stable"):
        for k, v in sg[arm].items():
            assert v == v and abs(v) < float("inf"), (arm, k, v)
    assert (sg["stable"]["seq_encoder_fid_vs_data"]
            <= 1.10 * sg["reference"]["seq_encoder_fid_vs_data"])
    # the stable preset's defining property, now measured at generation
    # time through its own flows
    assert sg["stable"]["gen_z_norm_mean_t_last"] < 100.0
    # equal-config early stopping is stated in the artifact
    assert "epochs_run" in results["arms"]["reference"]
