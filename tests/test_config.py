"""Tests for the Hydra-compatible config composer.

Validates the config surface the reference exposes (reference: conf/config.yaml,
run_experiment.py:342): group defaults, CLI group selection, dotted overrides,
interpolation, inheritance (hybrid model), and multirun expansion.
"""

from pathlib import Path

import pytest

from rlvae_tpu.config import Config, compose, expand_multirun

CONF_DIR = Path(__file__).resolve().parents[1] / "conf"


def test_default_composition():
    cfg = compose(CONF_DIR)
    assert cfg.model.latent_dim == 16
    assert cfg.model.posterior.type == "riemannian_metric"
    assert cfg.training.trainer.max_epochs == 50  # full_data default
    assert cfg.data.sequence_length == 8
    assert cfg.experiment.type == "single"
    assert cfg.seed == 42


def test_group_selection():
    cfg = compose(CONF_DIR, overrides=["model=vanilla_vae", "training=quick"])
    assert cfg.model.n_flows == 0
    assert cfg.model.posterior.type == "gaussian"
    assert cfg.model.riemannian_beta == 0.0
    assert cfg.training.trainer.max_epochs == 20
    assert cfg.training.data.batch_size == 4
    assert cfg.training.n_train_samples == 100


def test_dotted_overrides():
    cfg = compose(CONF_DIR, overrides=["model.latent_dim=32", "training.optimizer.lr=0.01"])
    assert cfg.model.latent_dim == 32
    assert cfg.training.optimizer.lr == 0.01


def test_value_types():
    cfg = compose(
        CONF_DIR,
        overrides=[
            "model.beta=2.5",
            "model.n_flows=3",
            "model.metric.temperature_override=null",
            "experiment.name=my_run",
            "model.input_dim=[1,32,32]",
        ],
    )
    assert cfg.model.beta == 2.5
    assert cfg.model.n_flows == 3
    assert cfg.model.metric.temperature_override is None
    assert cfg.experiment.name == "my_run"
    assert list(cfg.model.input_dim) == [1, 32, 32]


def test_interpolation():
    cfg = compose(CONF_DIR)
    # ${model.metric.path} inside pretrained.metric_path
    assert cfg.model.pretrained.metric_path == "data/pretrained/metric_T0.7_scaled.npz"
    # ${project_name} inside wandb.project
    assert cfg.wandb.project == cfg.project_name
    # ${now:...} resolved to a timestamp (no ${ left)
    assert "${" not in cfg.run.dir


def test_hybrid_inheritance():
    cfg = compose(CONF_DIR, overrides=["model=hybrid_rlvae"])
    # hybrid overrides on top of riemannian_flow_vae
    assert cfg.model.riemannian_beta == 1.0
    assert cfg.model.posterior.type == "gaussian"
    assert cfg.model.metric.enable_diagnostics is True
    assert "hybrid" in cfg.model._target_


def test_add_and_delete():
    cfg = compose(CONF_DIR, overrides=["+model.extra_flag=true", "~model.epsilon"])
    assert cfg.model.extra_flag is True
    assert cfg.model.get("epsilon") is None


def test_multirun_expansion():
    runs = list(expand_multirun(["model.riemannian_beta=1.0,8.0", "training=quick"]))
    assert len(runs) == 2
    assert runs[0] == ["model.riemannian_beta=1.0", "training=quick"]
    assert runs[1] == ["model.riemannian_beta=8.0", "training=quick"]
    # 2x3 product
    runs = list(expand_multirun(["a=1,2", "b=x,y,z"]))
    assert len(runs) == 6


def test_config_node_api():
    c = Config({"a": {"b": 1}, "c": [1, {"d": 2}]})
    assert c.a.b == 1
    assert c.get("a.b") == 1
    assert c.get("a.missing", "fallback") == "fallback"
    c.set("a.e.f", 3)
    assert c.a.e.f == 3
    d = c.to_dict()
    assert isinstance(d["a"], dict) and not isinstance(d["a"], Config)


def test_sweep_values_rejected_in_compose():
    with pytest.raises(ValueError):
        compose(CONF_DIR, overrides=["model.beta=1,2"])


def test_sample_config_loads():
    """sample_configs/modular_rlvae_example.yaml (reference analogue) builds
    a real model through the factory."""
    from pathlib import Path

    import yaml

    from rlvae_tpu.models.factory import create_model

    path = Path(__file__).resolve().parents[1] / "sample_configs" / "modular_rlvae_example.yaml"
    cfg = yaml.safe_load(path.read_text())
    model = create_model(cfg["model"])
    assert model.latent_dim == 16
    assert model.n_flows == 5
    assert model.encoder.__class__.__name__.lower().startswith("cnn")
