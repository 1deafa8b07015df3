"""Config-surface matrix: every shipped config composes and builds its model.

Guards against config rot across the whole conf/ tree (the reference's
equivalent gate is tests/test_setup.py's import/creation checks)."""

from pathlib import Path

import jax
import pytest

from rlvae_tpu.config import compose
from rlvae_tpu.models import create_model

CONF = Path(__file__).resolve().parents[1] / "conf"

MODELS = [p.stem for p in (CONF / "model").glob("*.yaml")]
TRAININGS = [p.stem for p in (CONF / "training").glob("*.yaml")]
VIZ = [p.stem for p in (CONF / "visualization").glob("*.yaml")]
EXPERIMENTS = [p.stem for p in (CONF / "experiment").glob("*.yaml")]


@pytest.mark.parametrize("model_name", MODELS)
def test_every_model_config_builds(model_name):
    cfg = compose(CONF, overrides=[f"model={model_name}"])
    model = create_model(cfg.model.to_dict())
    # tiny init to prove the architecture constructs (cnn/resnet need
    # pow2-divisible images; the shipped configs use 64x64)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    assert model.param_count(variables) > 0


@pytest.mark.parametrize("training", TRAININGS)
def test_every_training_config_composes(training):
    cfg = compose(CONF, overrides=[f"training={training}"])
    assert cfg.training.trainer.max_epochs > 0
    assert cfg.training.optimizer.lr > 0
    assert cfg.training.data.batch_size > 0


@pytest.mark.parametrize("viz", VIZ)
def test_every_viz_config_builds_manager(viz, tmp_path):
    from rlvae_tpu.viz import VisualizationConfig, VisualizationManager

    cfg = compose(CONF, overrides=[f"visualization={viz}"])
    vc = VisualizationConfig.from_mapping(cfg.visualization.to_dict())
    mgr = VisualizationManager(vc, tmp_path)
    assert mgr.modules  # at least basic is always enabled in shipped configs


@pytest.mark.parametrize("experiment", EXPERIMENTS)
def test_every_experiment_config_composes(experiment):
    cfg = compose(CONF, overrides=[f"experiment={experiment}"])
    assert cfg.experiment.type in ("single", "comparison", "sweep")


@pytest.mark.parametrize("arch", ["mlp", "cnn", "resnet"])
def test_decoder_output_matches_input_dim(arch):
    """Every decoder arch must reconstruct at EXACTLY the configured size.
    Regression: the resnet decoder once inherited the reference's own shape
    bug (decoder_manager.py:155-231 runs n+1 stride-2 stages from an H/2^n
    seed, returning 2x the configured size — which would crash the MSE)."""
    import jax.numpy as jnp

    from rlvae_tpu.nets import create_decoder, create_encoder

    for dim in ((3, 64, 64), (3, 8, 8)):
        if arch == "cnn" and dim[1] < 16:
            continue  # 4 stride-2 conv stages need >=16px
        enc = create_encoder(dim, 16, {"architecture": arch})
        dec = create_decoder(dim, 16, {"architecture": arch})
        z = jnp.zeros((2, 16))
        ev = enc.init(jax.random.PRNGKey(0), jnp.zeros((2, *dim)))
        out_e = enc.apply(ev, jnp.zeros((2, *dim)))
        assert out_e.embedding.shape == (2, 16)
        dv = dec.init(jax.random.PRNGKey(0), z)
        out = dec.apply(dv, z)
        assert out.reconstruction.shape == (2, *dim), (arch, dim)
