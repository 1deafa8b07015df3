"""App-layer tests: dashboard generation from a trained run directory."""

import jax
import numpy as np
import pytest

from rlvae_tpu.app import DashboardBuilder, build_report
from rlvae_tpu.data import CyclicDataModule
from rlvae_tpu.inference import ModelManager
from rlvae_tpu.models import RlVAE
from rlvae_tpu.train import Trainer


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    run_dir = tmp_path_factory.mktemp("run")
    data_cfg = {"sequence_length": 3, "image_size": [8, 8], "channels": 3,
                "synthetic_fallback": True, "synthetic_n_train": 8, "synthetic_n_test": 4}
    train_cfg = {"trainer": {"max_epochs": 1, "devices": 1}, "data": {"batch_size": 4},
                 "optimizer": {"lr": 1e-3}, "n_train_samples": 8, "n_val_samples": 4}
    model = RlVAE(input_dim=(3, 8, 8), latent_dim=4, n_flows=0,
                  posterior_type="gaussian", use_riemannian=False)
    dm = CyclicDataModule(data_cfg)
    dm.setup(train_cfg)
    Trainer(model, dm, train_cfg, run_dir=run_dir).fit()
    manager = ModelManager(model, None)
    # rebuild manager from checkpoint to mimic the app path
    cfg = {"input_dim": [3, 8, 8], "latent_dim": 4, "n_flows": 0,
           "posterior": {"type": "gaussian"}, "sampling": {"method": "standard"}}
    manager = ModelManager.from_checkpoint(run_dir, cfg)
    return run_dir, manager, dm.get_sample_batch("val", 2)


def test_dashboard_pages(trained_run, tmp_path):
    run_dir, manager, sample = trained_run
    b = DashboardBuilder(run_dir, manager, sample)
    b.page_overview()
    b.page_training_curves()
    b.page_inference(n=2)
    b.page_latent_exploration()
    html = b.render()
    for page in ("Overview", "Training curves", "Model inference", "Latent exploration"):
        assert f"<h2>{page}</h2>" in html
    assert "data:image/png;base64" in html  # embedded figures
    out = tmp_path / "r.html"
    out.write_text(html)
    assert out.stat().st_size > 10_000


def test_build_report_without_model(tmp_path):
    """Artifacts-only mode: no config/checkpoints -> still renders."""
    (tmp_path / "metrics.jsonl").write_text('{"_step": 1, "train/loss": 2.0}\n')
    out = build_report(tmp_path)
    html = out.read_text()
    assert "Training curves" in html
