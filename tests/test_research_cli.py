"""Research CLI + mask utilities (reference: src/lib/scripts/lvae_iaf.py,
gpvae.py, mask_creation_script.py, utils.py make_batched_masks)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from rlvae_tpu.data.masks import (
    create_and_save_masks,
    load_masks,
    make_batched_masks,
    make_pixel_masks,
)


def test_make_batched_masks_properties():
    mask = make_batched_masks((40, 8), prob_missing_data=0.5, batch_size=8, seed=0)
    assert mask.shape == (40, 8)
    assert set(np.unique(mask)) <= {0.0, 1.0}
    # every sequence keeps >= 2 observed frames (reference utils.py:18-20)
    assert (mask.sum(axis=1) >= 2).all()
    # batches share one pattern
    assert np.all(mask[:8] == mask[0])
    assert not np.all(mask[:8] == mask[8:16])
    # expected missing fraction ~ prob (the corrected Bernoulli rate)
    big = make_batched_masks((4000, 8), 0.5, batch_size=1, seed=1)
    assert abs(1.0 - big.mean() - 0.5) < 0.05


def test_make_batched_masks_degenerate_t():
    assert make_batched_masks((4, 2), 0.9, 2).min() == 1.0  # T<=2 -> all ones


def test_pixel_masks_rate():
    m = make_pixel_masks((4, 8, 3, 8, 8), 0.3, seed=0)
    assert m.shape == (4, 8, 3, 8, 8)
    assert abs(1.0 - m.mean() - 0.3) < 0.02
    assert make_pixel_masks((2, 2, 1, 4, 4), 0.0).min() == 1.0


def test_create_and_save_masks_roundtrip(tmp_path):
    p = create_and_save_masks(
        tmp_path, (10, 8, 3, 4, 4), (4, 8, 3, 4, 4), (4, 8, 3, 4, 4),
        prob_missing_data=0.25, prob_missing_pixels=0.1, batch_size=4,
    )
    masks = load_masks(p)
    assert set(masks) == {
        "train_seq_mask", "eval_seq_mask", "test_seq_mask",
        "train_pix_mask", "eval_pix_mask", "test_pix_mask",
    }
    assert masks["train_seq_mask"].shape == (10, 8)
    assert masks["train_pix_mask"].shape == (10, 8, 3, 4, 4)


@pytest.mark.parametrize("model", ["lvae_iaf", "vamp", "gpvae"])
def test_research_cli_trains(model, tmp_path, capsys):
    import research_cli

    rc = research_cli.main(
        [
            "--model", model, "--dataset", "synthetic",
            "--latent_dim", "4", "--n_obs", "4",
            "--num_epochs", "2", "--batch_size", "4",
            "--n_train", "8", "--n_eval", "4",
            "--prob_missing_data", "0.25", "--prob_missing_pixels", "0.1",
            "--output_dir", str(tmp_path),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(out)
    assert np.isfinite(result["final_loss"])
    assert np.isfinite(result["eval_mse"])
    run_dir = tmp_path / f"{model}_synthetic"
    assert (run_dir / "results.json").exists()
    assert (run_dir / "params.npz").exists()


def test_research_cli_nll(tmp_path, capsys):
    import research_cli

    rc = research_cli.main(
        [
            "--model", "vamp", "--latent_dim", "4", "--n_obs", "4",
            "--num_epochs", "1", "--batch_size", "4",
            "--n_train", "4", "--n_eval", "4",
            "--compute_nll", "1", "--nll_n_samples", "5",
            "--output_dir", str(tmp_path),
        ]
    )
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(result["eval_nll"])


def test_research_cli_make_masks(tmp_path, capsys):
    import research_cli

    rc = research_cli.main(
        [
            "--make_masks", "--prob_missing_data", "0.3",
            "--n_obs", "4", "--n_train", "8", "--n_eval", "4",
            "--output_dir", str(tmp_path),
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert Path(out["masks"]).exists()
