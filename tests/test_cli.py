"""CLI-surface tests: run_experiment single/comparison/sweep on tiny configs
(reference analogue: the SLURM quick-test gate, scripts/run_quick_test.sh)."""

from pathlib import Path

import pytest
import yaml

import run_experiment

TINY = [
    "training=quick",
    "visualization=minimal",
    "training.trainer.max_epochs=1",
    "training.trainer.log_every_n_steps=50",
    "training.n_train_samples=8",
    "training.n_val_samples=4",
    "data.synthetic_n_train=8",
    "data.synthetic_n_test=4",
    "data.image_size=[4,4]",
    "model.n_flows=0",
    "training.model.n_flows=0",
]


def _run(tmp_path, extra):
    run_experiment.main(TINY + [f"run.dir={tmp_path}"] + extra)
    return tmp_path


def test_single_cli(tmp_path):
    _run(tmp_path, ["model=vanilla_vae", "experiment_name=t_single"])
    results = yaml.safe_load((tmp_path / "results.yaml").read_text())
    assert "best_val_loss" in results and "test" in results
    assert (tmp_path / "checkpoints" / "best").exists()
    assert (tmp_path / "config.yaml").exists()


def test_comparison_cli(tmp_path):
    _run(
        tmp_path,
        [
            "experiment=comparison_study",
            "experiment.training_override.n_epochs=1",
            "experiment.training_override.n_train_samples=8",
            "experiment.training_override.n_val_samples=4",
        ],
    )
    results = yaml.safe_load((tmp_path / "results.yaml").read_text())
    assert set(results["models"]) == {"vanilla_vae", "riemannian_flow_vae"}
    assert "comparison" in results
    # per-model run dirs with their own checkpoints
    assert (tmp_path / "vanilla_vae" / "checkpoints" / "best").exists()


@pytest.mark.slow
def test_sweep_cli(tmp_path):
    _run(
        tmp_path,
        [
            "experiment=hyperparameter_sweep",
            "experiment.max_runs=2",
            "experiment.training_override.n_epochs=1",
            "experiment.training_override.n_train_samples=8",
        ],
    )
    results = yaml.safe_load((tmp_path / "results.yaml").read_text())
    assert len(results["runs"]) == 2
    # sorted by objective
    assert results["runs"][0]["best_val_loss"] <= results["runs"][1]["best_val_loss"]
    assert (tmp_path / "run_0" / "results.yaml").exists()
