"""Pipeline + callback stack tests (reference: pythae pipelines/training.py,
pipelines/generation.py, trainers/training_callbacks.py — the trainer-stack
tier SURVEY §2b lists)."""

from pathlib import Path

import jax
import numpy as np
import pytest

from rlvae_tpu.data import CyclicDataModule
from rlvae_tpu.geometry import load_metric
from rlvae_tpu.models import RlVAE
from rlvae_tpu.models.research import VAMP
from rlvae_tpu.samplers import NormalSampler, RHVAEGenerationSampler, VampSampler
from rlvae_tpu.train import (
    CallbackHandler,
    GenerationPipeline,
    MetricConsoleLoggerCallback,
    ProgressBarCallback,
    Trainer,
    TrainingCallback,
    TrainingPipeline,
)

DATA = Path(__file__).resolve().parents[1] / "data" / "pretrained"


def _tiny_model():
    return RlVAE(
        input_dim=(3, 8, 8), latent_dim=8, n_flows=2, flow_hidden_size=16,
        posterior_type="gaussian", sampling_method="standard", use_riemannian=False,
    )


class RecordingCallback(TrainingCallback):
    def __init__(self):
        self.events = []

    def on_init_end(self, cfg, **kw):
        self.events.append("init_end")

    def on_train_begin(self, cfg, **kw):
        self.events.append("train_begin")

    def on_epoch_begin(self, cfg, **kw):
        self.events.append(f"epoch_begin:{kw['epoch']}")

    def on_epoch_end(self, cfg, **kw):
        self.events.append(f"epoch_end:{kw['epoch']}")
        assert "logs" in kw and isinstance(kw["logs"], dict)

    def on_train_step_end(self, cfg, **kw):
        self.events.append("step_end")

    def on_save(self, cfg, **kw):
        self.events.append(f"save:{kw['slot']}")

    def on_train_end(self, cfg, **kw):
        self.events.append("train_end")
        assert np.isfinite(kw["result"]["best_val_loss"])


def test_callback_handler_dispatch_and_dedup():
    h = CallbackHandler()
    cb = RecordingCallback()
    h.add_callback(cb)
    h.add_callback(RecordingCallback())  # same type -> deduped
    assert len(h.callbacks) == 1
    h.on_train_begin({})
    h.on_epoch_begin({}, epoch=0)
    assert cb.events == ["train_begin", "epoch_begin:0"]


def test_trainer_fires_callbacks(tmp_path):
    model = _tiny_model()
    dm = CyclicDataModule(
        {
            "sequence_length": 4,
            "image_size": [8, 8],
            "channels": 3,
            "synthetic_fallback": True,
            "synthetic_n_train": 8,
            "synthetic_n_test": 4,
        }
    )
    cfg = {
        "trainer": {"max_epochs": 2, "devices": 1, "log_every_n_steps": 1},
        "data": {"batch_size": 4},
        "optimizer": {"lr": 1e-3},
        "n_train_samples": 8,
        "n_val_samples": 4,
    }
    dm.setup(cfg)
    cb = RecordingCallback()
    trainer = Trainer(
        model, dm, cfg, run_dir=tmp_path,
        callbacks=[cb, MetricConsoleLoggerCallback(), ProgressBarCallback()],
    )
    trainer.fit()
    assert cb.events[0] == "init_end"
    assert "train_begin" in cb.events
    assert "epoch_begin:0" in cb.events and "epoch_end:1" in cb.events
    assert "step_end" in cb.events
    assert "save:best" in cb.events and "save:last" in cb.events
    assert cb.events[-1] == "train_end"


def test_training_pipeline_arrays(tmp_path):
    model = _tiny_model()
    rng = np.random.default_rng(0)
    train = rng.uniform(size=(12, 4, 3, 8, 8)).astype(np.float32)
    pipe = TrainingPipeline(
        model,
        {
            "trainer": {"max_epochs": 2, "log_every_n_steps": 2},
            "data": {"batch_size": 4},
        },
        output_dir=tmp_path,
    )
    result = pipe(train)
    assert np.isfinite(result["best_val_loss"])
    run_dir = Path(result["run_dir"])
    assert (run_dir / "final_model" / "model_config.json").exists()
    # the documented layout: final weights live beside the config sidecar
    assert (run_dir / "final_model" / "weights").exists()


def test_generation_pipeline_normal():
    model = _tiny_model()
    variables = model.init(jax.random.PRNGKey(0), n_obs=4)
    pipe = GenerationPipeline(model, variables, sampler="normal")
    gen = pipe(num_samples=5, batch_size=3)
    assert gen.shape == (5, 3, 8, 8)
    assert np.all(np.isfinite(gen)) and gen.min() >= 0.0 and gen.max() <= 1.0


def test_generation_pipeline_saves(tmp_path):
    model = _tiny_model()
    variables = model.init(jax.random.PRNGKey(0), n_obs=4)
    pipe = GenerationPipeline(model, variables, sampler="normal")
    out = pipe(
        num_samples=3, output_dir=tmp_path, return_gen=False, save_sampler_config=True
    )
    assert out is None
    saved = np.load(tmp_path / "generated.npz")["images"]
    assert saved.shape == (3, 3, 8, 8)
    assert (tmp_path / "sampler_config.json").exists()


def test_generation_pipeline_vamp():
    model = VAMP(input_dim=(3, 8, 8), latent_dim=8, number_components=4)
    variables = model.init(jax.random.PRNGKey(0))
    pipe = GenerationPipeline(model, variables, sampler="vamp")
    gen = pipe(num_samples=6, batch_size=4, seed=1)
    assert gen.shape == (6, 3, 8, 8)
    assert np.all(np.isfinite(gen))
    # latents really come from the pseudo-input mixture: resampling with the
    # same seed reproduces, a different seed does not
    s = VampSampler(model, variables)
    z1 = np.asarray(s.sample_latents(jax.random.PRNGKey(0), 8))
    z2 = np.asarray(s.sample_latents(jax.random.PRNGKey(0), 8))
    z3 = np.asarray(s.sample_latents(jax.random.PRNGKey(1), 8))
    np.testing.assert_array_equal(z1, z2)
    assert not np.allclose(z1, z3)


def test_generation_pipeline_rhvae():
    metric = load_metric(DATA / "metric_T0.7_scaled.npz")
    model = RlVAE(
        input_dim=(3, 8, 8), latent_dim=16, n_flows=2, flow_hidden_size=16,
        posterior_type="riemannian_metric", metric=metric,
    )
    variables = model.init(jax.random.PRNGKey(0), n_obs=4)
    from rlvae_tpu.samplers import HMCConfig

    sampler = RHVAEGenerationSampler(
        model, variables, hmc_config=HMCConfig(mcmc_steps=2, n_lf=3, init="centroids")
    )
    pipe = GenerationPipeline(model, variables, sampler=sampler)
    gen = pipe(num_samples=4, batch_size=4)
    assert gen.shape == (4, 3, 8, 8)
    assert np.all(np.isfinite(gen))


def test_generation_pipeline_rhvae_adaptive():
    """The beyond-reference 'rhvae_adaptive' registry entry: fit() pays
    calibration + warm pool once, sample calls reuse the plan (samplers/
    generation.py:AdaptiveRHVAEGenerationSampler; evidence
    outputs/adaptive_hmc/)."""
    from rlvae_tpu.samplers import AdaptiveRHVAEGenerationSampler, HMCConfig

    metric = load_metric(DATA / "metric_T0.7_scaled.npz")
    model = RlVAE(
        input_dim=(3, 8, 8), latent_dim=16, n_flows=2, flow_hidden_size=16,
        posterior_type="riemannian_metric", metric=metric,
    )
    variables = model.init(jax.random.PRNGKey(0), n_obs=4)
    cfg = HMCConfig(mcmc_steps=8, n_lf=3, init="centroids", backend="xla")
    sampler = AdaptiveRHVAEGenerationSampler(
        model, variables, hmc_config=cfg, pool_size=32, gen_steps=3,
    )
    pipe = GenerationPipeline(model, variables, sampler=sampler)
    gen = pipe(num_samples=4, batch_size=4)
    assert gen.shape == (4, 3, 8, 8)
    assert np.all(np.isfinite(gen))
    # fit ran implicitly and produced a usable calibrated plan + pool
    assert sampler.plan is not None
    assert sampler.plan["pool"].shape == (32, 16)
    assert float(np.min(np.asarray(sampler.plan["eps"]))) > 0
    # persistent mode (default): the sampled chains' final states scatter
    # back into the pool — the stored chains get more converged with use
    pool_before = np.asarray(sampler.plan["pool"]).copy()
    z_p = np.asarray(sampler.sample_latents(jax.random.PRNGKey(3), 8))
    pool_after = np.asarray(sampler.plan["pool"])
    changed = np.any(pool_before != pool_after, axis=1)
    # at most the 8 drawn slots moved (a slot may stay put if its short
    # chain rejected every proposal), at least some moved, and every moved
    # slot holds one of the returned draws
    assert 1 <= changed.sum() <= 8
    z_set = {tuple(r) for r in z_p}
    assert all(tuple(r) in z_set for r in pool_after[changed])
    # non-persistent sampler: same key reproduces, different key does not
    frozen = AdaptiveRHVAEGenerationSampler(
        model, variables, hmc_config=cfg, pool_size=32, gen_steps=3,
        persistent=False,
    )
    z1 = np.asarray(frozen.sample_latents(jax.random.PRNGKey(3), 8))
    z2 = np.asarray(frozen.sample_latents(jax.random.PRNGKey(3), 8))
    z3 = np.asarray(frozen.sample_latents(jax.random.PRNGKey(4), 8))
    np.testing.assert_array_equal(z1, z2)
    assert not np.allclose(z1, z3)


def test_generation_pipeline_unknown_sampler():
    model = _tiny_model()
    with pytest.raises(NotImplementedError):
        GenerationPipeline(model, None, sampler="pixelcnn_nope")


def test_pipeline_data_module_shards_per_process(monkeypatch):
    """_data_module_from_arrays keeps only this process's strided train
    shard (same slicing as CyclicDataModule.setup) — an unsharded
    assignment would make the sharded-epoch staging upload every sequence
    once PER HOST, silently duplicating the dataset.  Eval stays
    host-replicated."""
    from rlvae_tpu.train import pipelines as pl

    data = np.arange(12 * 2 * 1 * 4 * 4, dtype=np.float32).reshape(12, 2, 1, 4, 4)
    ev = data[:4]
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    shards = []
    for pi in (0, 1):
        monkeypatch.setattr(jax, "process_index", lambda pi=pi: pi)
        dm = pl._data_module_from_arrays(data, ev, {"data": {"batch_size": 4}})
        shards.append(np.asarray(dm.train.data))
        np.testing.assert_array_equal(np.asarray(dm.val.data), ev)  # replicated
    assert shards[0].shape[0] == shards[1].shape[0] == 6  # equal shards
    np.testing.assert_array_equal(shards[0], data[0::2])
    np.testing.assert_array_equal(shards[1], data[1::2])
