"""Validates the committed on-chip train-step breakdown artifact.

Round-4 VERDICT item 1: the ~11% MFU plateau must be *attributed* with a
committed per-stage artifact (isolated jitted stage timings + XLA's own
cost analysis), not argued in bench prose.  outputs/step_breakdown/ is
produced by scripts/profile_step_breakdown.py on the TPU; bench.py's
composite step ceiling (`step_pct_of_composite_ceiling`) is calibrated
against these numbers.

NB: an ARTIFACT gate — regenerate with the script after touching the
flagship forward/backward, the flows, or the trainer step.
"""

import json
from pathlib import Path

import pytest

ART = Path(__file__).resolve().parents[1] / "outputs" / "step_breakdown"

PEAK = 197e12  # v5e bf16 peak (bench.py)
HBM = 819e9

CONFIGS = ("density_parity", "sampling_stable", "stable_bf16_remat",
           "tpu_shaped_128")


@pytest.fixture(scope="module")
def results():
    if not (ART / "results.json").exists():
        pytest.skip("step-breakdown artifact not present "
                    "(scripts/profile_step_breakdown.py)")
    return json.loads((ART / "results.json").read_text())


def test_all_configs_profiled(results):
    """Parity preset, stable preset, the bf16+remat harvest, and the
    TPU-shaped falsification config (VERDICT r4 item 2) are all present
    with finite stage timings and XLA cost analysis."""
    for cfg in CONFIGS:
        entry = results[cfg]
        assert entry["batch"] >= 4096
        for stage, ms in entry["stage_ms"].items():
            assert 0.0 < ms < 1e4, (cfg, stage, ms)
        for stage, cost in entry["xla_cost"].items():
            assert cost["flops"] > 0 and cost["bytes"] > 0, (cfg, stage)
        # the full step dominates any isolated forward stage
        assert (entry["stage_ms"]["train_step"]
                >= 0.9 * entry["stage_ms"]["forward_grad"])


def test_plateau_is_byte_bound_not_tile_fill(results):
    """The attribution the round-4 verdict demanded: at B=4096 the stable
    step's forward+grad sits high on HBM bandwidth and low on peak flops —
    the plateau is bytes, not MXU tile under-fill."""
    entry = results["sampling_stable"]
    ms = entry["stage_ms"]["forward_grad"]
    cost = entry["xla_cost"]["forward_grad"]
    hbm_frac = cost["bytes"] / (ms / 1e3) / HBM
    flop_frac = cost["flops"] / (ms / 1e3) / PEAK
    assert hbm_frac > 0.5, f"not byte-bound: {hbm_frac:.2f} of HBM"
    assert flop_frac < 0.3, f"flop-bound after all: {flop_frac:.2f} of peak"


def test_harvest_is_real(results):
    """bf16 reconstructions + checkpointed decode+MSE must actually cut
    bytes AND wall-clock vs the plain stable step at the same shape."""
    stable = results["sampling_stable"]
    harvest = results["stable_bf16_remat"]
    assert (harvest["stage_ms"]["train_step"]
            < stable["stage_ms"]["train_step"])
    assert (harvest["xla_cost"]["train_step"]["bytes"]
            < 0.9 * stable["xla_cost"]["train_step"]["bytes"])


def test_tpu_shaped_config_raises_flop_fraction(results):
    """Falsify-or-prove (VERDICT r4 item 2): at latent 128 / flow hidden
    512 the same code must spend a larger fraction of peak flops than the
    latent-16 stable step — width fills the tiles once the byte bottleneck
    is addressed."""
    def flop_frac(cfg):
        e = results[cfg]
        return (e["xla_cost"]["train_step"]["flops"]
                / (e["stage_ms"]["train_step"] / 1e3) / PEAK)

    assert flop_frac("tpu_shaped_128") > flop_frac("sampling_stable")
