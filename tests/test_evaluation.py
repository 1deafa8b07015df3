"""Evaluation + FID utilities and CLI (reference: src/lib/scripts/
evaluation.py, fid.py)."""

import json
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from rlvae_tpu.models import RlVAE
from rlvae_tpu.utils.evaluation import evaluate_missing, evaluate_reconstruction
from rlvae_tpu.utils.fid import (
    compute_statistics,
    encoder_features,
    fid_score,
    frechet_distance,
    pixel_features,
)


def test_frechet_distance_identical_is_zero():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(200, 8))
    mu, s = compute_statistics(f)
    assert frechet_distance(mu, s, mu, s) == pytest.approx(0.0, abs=1e-6)
    assert fid_score(f, f.copy()) == pytest.approx(0.0, abs=1e-6)


def test_frechet_distance_analytic():
    """Diagonal Gaussians: d^2 = |dmu|^2 + sum (sqrt(s1) - sqrt(s2))^2."""
    mu1, mu2 = np.zeros(3), np.array([1.0, 0.0, 2.0])
    s1 = np.diag([1.0, 4.0, 9.0])
    s2 = np.diag([4.0, 1.0, 9.0])
    expected = 5.0 + ((1 - 2) ** 2 + (2 - 1) ** 2 + 0.0)
    assert frechet_distance(mu1, s1, mu2, s2) == pytest.approx(expected, rel=1e-4)


def test_fid_orders_similarity():
    rng = np.random.default_rng(1)
    real = rng.normal(size=(300, 6))
    near = real + 0.05 * rng.normal(size=real.shape)
    far = rng.normal(loc=3.0, size=(300, 6))
    assert fid_score(real, near) < fid_score(real, far)


def test_pixel_features_pooling():
    imgs = np.ones((4, 3, 32, 32), np.float32)
    f = pixel_features(imgs, size=8)
    assert f.shape == (4, 3 * 8 * 8)
    np.testing.assert_allclose(f, 1.0)
    seq = np.ones((2, 5, 3, 32, 32), np.float32)
    assert pixel_features(seq, size=8).shape == (10, 3 * 8 * 8)


def _tiny_manager():
    from rlvae_tpu.inference import ModelManager

    model = RlVAE(
        input_dim=(3, 8, 8), latent_dim=8, n_flows=2, flow_hidden_size=16,
        posterior_type="gaussian", sampling_method="standard", use_riemannian=False,
    )
    return ModelManager(model, model.init(jax.random.PRNGKey(0), n_obs=4))


def test_evaluate_reconstruction_finite():
    m = _tiny_manager()
    data = np.random.default_rng(0).uniform(size=(8, 4, 3, 8, 8)).astype(np.float32)
    res = evaluate_reconstruction(m.model, m.variables, data, n_runs=2, batch_size=4)
    assert np.isfinite(res["recon_mse"]) and res["recon_mse"] > 0
    assert res["n_runs"] == 2


def test_evaluate_missing_masked_metrics():
    from rlvae_tpu.data.masks import make_batched_masks, make_pixel_masks

    m = _tiny_manager()
    data = np.random.default_rng(0).uniform(size=(8, 4, 3, 8, 8)).astype(np.float32)
    seq_mask = make_batched_masks(data.shape, 0.4, batch_size=4, seed=0)
    pix_mask = make_pixel_masks(data.shape, 0.2, seed=1)
    res = evaluate_missing(
        m.model, m.variables, data, seq_mask, pix_mask, n_runs=2, batch_size=4
    )
    for k in ("missing_pixel_mse", "missing_frame_mse"):
        assert np.isfinite(res[k]) and res[k] > 0
    # all-observed masks zero out both metrics
    res0 = evaluate_missing(
        m.model, m.variables, data,
        np.ones(data.shape[:2], np.float32), np.ones_like(data), n_runs=1, batch_size=4,
    )
    assert res0["missing_pixel_mse"] == 0.0
    assert res0["missing_frame_mse"] == 0.0


def test_encoder_features_shape():
    m = _tiny_manager()
    imgs = np.random.default_rng(0).uniform(size=(6, 3, 8, 8)).astype(np.float32)
    f = encoder_features(lambda x: m.encode(x).embedding, imgs, batch_size=4)
    assert f.shape == (6, 8)


def test_evaluation_cli(tmp_path, capsys):
    """CLI over a synthetic run dir (checkpoint + config.yaml sidecar)."""
    import yaml

    import evaluation_cli
    from rlvae_tpu.train import CheckpointManager

    model_cfg = {
        "input_dim": [3, 8, 8], "latent_dim": 8, "n_flows": 2,
        "flow_hidden_size": 16,
        "posterior": {"type": "gaussian"},
        "sampling": {"method": "standard", "use_riemannian": False},
    }
    from rlvae_tpu.models.factory import create_model

    model = create_model(model_cfg)
    variables = model.init(jax.random.PRNGKey(0), n_obs=4)
    ckpt = CheckpointManager(tmp_path / "checkpoints")
    ckpt.save("best", {"variables": variables, "step": 0, "val_loss": 1.0})
    ckpt.wait()
    (tmp_path / "config.yaml").write_text(yaml.safe_dump({"model": model_cfg}))

    rc = evaluation_cli.main(
        [
            "--run_dir", str(tmp_path), "--n_test", "8", "--n_obs", "4",
            "--batch_size", "4", "--n_runs", "1", "--fid_samples", "8",
            "--sample_method", "standard",
            "--prob_missing_data", "0.25", "--prob_missing_pixels", "0.1",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for k in ("recon_mse", "missing_pixel_mse", "missing_frame_mse",
              "fid_pixel", "fid_encoder"):
        assert np.isfinite(out[k]), k


def test_forward_recon_masks_input_for_maskless_models():
    """Models without native mask params (RlVAE) must not see masked-out
    content: _forward_recon zeroes it before the forward, so imputation
    metrics are not leaky."""
    import jax.numpy as jnp

    from rlvae_tpu.utils.evaluation import _forward_recon

    m = _tiny_manager()
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(4, 4, 3, 8, 8)).astype(np.float32)
    )
    key = jax.random.PRNGKey(3)
    pix_zero = jnp.zeros_like(x)
    sm = jnp.ones(x.shape[:2], jnp.float32)
    masked = _forward_recon(m.model, m.variables, x, key, seq_mask=sm, pix_mask=pix_zero)
    from_zeros = _forward_recon(m.model, m.variables, jnp.zeros_like(x), key)
    np.testing.assert_allclose(np.asarray(masked), np.asarray(from_zeros), atol=1e-6)
    # and with full masks the input passes through unchanged
    unmasked = _forward_recon(
        m.model, m.variables, x, key, seq_mask=sm, pix_mask=jnp.ones_like(x)
    )
    plain = _forward_recon(m.model, m.variables, x, key)
    np.testing.assert_allclose(np.asarray(unmasked), np.asarray(plain), atol=1e-6)
