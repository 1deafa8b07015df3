"""Environment/setup validation — the reference's third test tier
(reference: tests/test_setup.py:18-116: imports, data paths, model creation,
pretrained loading) plus the new config-schema gate."""

import jax
import numpy as np
import pytest


def test_imports():
    import rlvae_tpu  # noqa: F401
    from rlvae_tpu.geometry import CentroidMetric  # noqa: F401
    from rlvae_tpu.models import RlVAE  # noqa: F401
    from rlvae_tpu.samplers import sample_prior_hmc  # noqa: F401
    from rlvae_tpu.train import Trainer  # noqa: F401

    assert rlvae_tpu.__version__


def test_validate_paths():
    from rlvae_tpu.config import validate_paths

    status = validate_paths()
    # the converted reference metric artifacts are committed
    assert status["metric"] and status["metric_T0.7"]
    with pytest.raises(FileNotFoundError):
        validate_paths(require_pretrained=True)  # encoder/decoder not shipped


def test_pretrained_metric_loads_into_model():
    from rlvae_tpu.config import METRIC_PATH
    from rlvae_tpu.models import RlVAE

    model = RlVAE(input_dim=(3, 8, 8), latent_dim=16, n_flows=0)
    model.load_pretrained_metric(METRIC_PATH)
    assert model.metric.n_centroids == 200


def test_schema_validation():
    from rlvae_tpu.config.schema import assert_valid, validate_config

    good = {
        "model": {"latent_dim": 16, "posterior": {"type": "gaussian"},
                  "sampling": {"method": "standard"}},
        "training": {"trainer": {"max_epochs": 1}, "data": {"batch_size": 2},
                     "optimizer": {"lr": 1e-3}},
        "experiment": {"type": "single"},
        "visualization": {"level": "minimal"},
    }
    assert validate_config(good) == []
    bad = {**good, "model": {**good["model"], "posterior": {"type": "bogus"},
                             "latent_dim": -1}}
    problems = validate_config(bad)
    assert any("posterior.type" in p for p in problems)
    assert any("latent_dim" in p for p in problems)
    with pytest.raises(ValueError, match="Invalid configuration"):
        assert_valid(bad)


def test_reference_spelling_alias():
    """'enhanced_riemannian' (reference training configs) maps to 'enhanced'."""
    from rlvae_tpu.models import create_model

    model = create_model(
        {"input_dim": [3, 8, 8], "latent_dim": 8, "n_flows": 0,
         "sampling": {"method": "enhanced_riemannian", "use_riemannian": True}}
    )
    assert model.sampling_method == "enhanced"


def test_cli_rejects_invalid_config():
    import run_experiment
    from rlvae_tpu.config import compose

    cfg = compose("conf", overrides=["model.posterior.type=bogus"])
    with pytest.raises(ValueError, match="posterior.type"):
        run_experiment.ExperimentRunner(cfg)


def test_parity_tier_canary(reference_available):
    """Canary: the torch-parity tier must actually RUN on this machine.

    Every parity test skips politely when torch or /root/reference is
    missing — correct for foreign checkouts, but it means an environment
    regression (torch install broken, reference unmounted) would turn the
    entire reference-parity gate green-by-omission.  This test FAILS
    loudly instead, so `pytest -q` can never report success with the
    parity tier silently skipped on the machine it is meant to run on."""
    import importlib.util

    assert importlib.util.find_spec("torch") is not None, (
        "torch is not importable: the ~15 reference-parity tests are all "
        "silently skipping"
    )
    assert reference_available, (
        "/root/reference is not mounted: the reference-parity tests are "
        "all silently skipping"
    )
