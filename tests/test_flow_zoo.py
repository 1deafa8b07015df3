"""Flow zoo tests: MAF round-trip, planar/radial logdet vs autodiff Jacobians,
plus NLL estimator + trainer resume."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from rlvae_tpu.flows import iaf_masks
from rlvae_tpu.flows.zoo import (
    init_maf,
    init_planar,
    init_radial,
    maf_forward,
    maf_inverse,
    planar_forward,
    radial_forward,
)

D = 8


def test_maf_roundtrip():
    masks = iaf_masks(D, 32, 3)
    params = init_maf(jax.random.PRNGKey(0), D, 32, n_blocks=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (6, D))
    y, ld_f = maf_forward(params, masks, x)
    x_back, ld_i = maf_inverse(params, masks, y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=1e-5)


def _check_logdet_vs_jacobian(fn, params, x):
    y, ld = fn(params, x)

    def single(xi):
        return fn(params, xi[None, :])[0][0]

    jac = jax.vmap(jax.jacfwd(single))(x)
    _, ld_exact = np.linalg.slogdet(np.asarray(jac))
    np.testing.assert_allclose(np.asarray(ld), ld_exact, rtol=1e-4, atol=1e-4)
    return y


def test_planar_logdet_exact():
    params = init_planar(jax.random.PRNGKey(2), D)
    params = jax.tree_util.tree_map(lambda a: a * 30.0, params)  # non-trivial
    x = jax.random.normal(jax.random.PRNGKey(3), (5, D))
    _check_logdet_vs_jacobian(planar_forward, params, x)


def test_radial_logdet_exact():
    params = init_radial(jax.random.PRNGKey(4), D)
    params = {**params, "beta_raw": jnp.asarray(1.5), "log_alpha": jnp.asarray(-0.5)}
    x = jax.random.normal(jax.random.PRNGKey(5), (5, D))
    _check_logdet_vs_jacobian(radial_forward, params, x)


def test_nll_estimator():
    from rlvae_tpu.models import RlVAE

    model = RlVAE(input_dim=(3, 4, 4), latent_dim=4, n_flows=2, flow_hidden_size=16,
                  posterior_type="gaussian", use_riemannian=False)
    variables = model.init(jax.random.PRNGKey(0), n_obs=3)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(3, 3, 3, 4, 4)), jnp.float32)
    nll = model.estimate_nll(variables, x, jax.random.PRNGKey(1), n_samples=8)
    assert nll.shape == (3,)
    assert np.isfinite(np.asarray(nll)).all()
    # discriminating check: more importance samples must SHRINK the
    # key-to-key variance of the estimate (a ~sqrt(S) effect an estimator
    # that ignores n_samples cannot show); same-scale checks alone pass
    # for badly broken estimators
    def spread(s):
        a = model.estimate_nll(variables, x, jax.random.PRNGKey(2), n_samples=s)
        b = model.estimate_nll(variables, x, jax.random.PRNGKey(3), n_samples=s)
        return np.abs(np.asarray(a) - np.asarray(b)).mean()

    s1, s16 = spread(1), spread(16)
    assert s16 < s1, f"n_samples has no effect: spread(1)={s1} spread(16)={s16}"
    # and the estimates at different sample counts agree to a few nats
    nll2 = model.estimate_nll(variables, x, jax.random.PRNGKey(1), n_samples=16)
    assert np.abs(np.asarray(nll2) - np.asarray(nll)).max() < 10.0


def test_trainer_resume(tmp_path):
    from rlvae_tpu.data import CyclicDataModule
    from rlvae_tpu.models import RlVAE
    from rlvae_tpu.train import Trainer

    data_cfg = {"sequence_length": 3, "image_size": [4, 4], "channels": 3,
                "synthetic_fallback": True, "synthetic_n_train": 8, "synthetic_n_test": 4}
    train_cfg = {"trainer": {"max_epochs": 2, "devices": 1, "log_every_n_steps": 10},
                 "data": {"batch_size": 4}, "optimizer": {"lr": 1e-3},
                 "n_train_samples": 8, "n_val_samples": 4}
    model = RlVAE(input_dim=(3, 4, 4), latent_dim=4, n_flows=0,
                  posterior_type="gaussian", use_riemannian=False)
    dm = CyclicDataModule(data_cfg)
    dm.setup(train_cfg)
    t1 = Trainer(model, dm, train_cfg, run_dir=tmp_path)
    r1 = t1.fit()
    assert r1["epochs_run"] == 2

    # resume continues from epoch 2 with 2 more epochs
    train_cfg2 = {**train_cfg, "trainer": {**train_cfg["trainer"], "max_epochs": 4}}
    t2 = Trainer(model, dm, train_cfg2, run_dir=tmp_path)
    r2 = t2.fit(resume=True)
    assert r2["epochs_run"] == 4  # epoch counter reached 3 (0-indexed)
    assert np.isfinite(r2["best_val_loss"])


def test_normalizing_flow_wrapper_roundtrip(tmp_path):
    """BaseNF-equivalent wrapper: forward/inverse protocol + save/load
    (reference: normalizing_flows/base/base_nf_model.py:16-208)."""
    from rlvae_tpu.flows.zoo import NormalizingFlow

    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 8)), jnp.float32)
    for family in ("iaf", "maf"):
        nf = NormalizingFlow(family, 8, key=jax.random.PRNGKey(1), hidden_size=16)
        y, ld = nf.forward(x)
        x_back, ld_i = nf.inverse(y)
        np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ld + ld_i), 0.0, atol=1e-4)
        nf.save(tmp_path / family)
        nf2 = NormalizingFlow.load(tmp_path / family)
        y2, _ = nf2.forward(x)
        np.testing.assert_array_equal(np.asarray(y2), np.asarray(y))
    for family in ("planar", "radial"):
        nf = NormalizingFlow(family, 8, key=jax.random.PRNGKey(2))
        y, ld = nf.forward(x)
        assert np.isfinite(np.asarray(y)).all() and np.isfinite(np.asarray(ld)).all()
        with pytest.raises(NotImplementedError):
            nf.inverse(y)


def test_pixelcnn_autoregressive():
    """PixelCNN: finite CE loss, correct logit shape, and the type-A mask
    makes pixel (i,j) independent of itself and later pixels
    (reference: pixelcnn_model.py:69-93, utils.py:38-48)."""
    from rlvae_tpu.flows.pixelcnn import PixelCNN, pixelcnn_sample

    model = PixelCNN(input_dim=(1, 6, 6), n_embeddings=4, n_layers=2, kernel_size=3, hidden=8)
    x = jnp.asarray(np.random.default_rng(0).integers(0, 4, size=(2, 1, 6, 6)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.out.shape == (2, 4, 1, 6, 6)
    assert np.isfinite(float(out.loss))

    # autoregressive property: changing pixel (3,3) must not change logits at
    # (3,3) or any earlier raster position
    x2 = x.at[:, 0, 3, 3].set((x[:, 0, 3, 3] + 1) % 4)
    l1 = np.asarray(model.apply(variables, x).out)
    l2 = np.asarray(model.apply(variables, x2).out)
    np.testing.assert_array_equal(l1[:, :, 0, 3, 3], l2[:, :, 0, 3, 3])
    np.testing.assert_array_equal(l1[:, :, 0, :3], l2[:, :, 0, :3])
    np.testing.assert_array_equal(l1[:, :, 0, 3, :3], l2[:, :, 0, 3, :3])
    # later pixels MAY depend on it (receptive field): the sample path runs
    samples = pixelcnn_sample(model, variables, jax.random.PRNGKey(1), n=2)
    assert samples.shape == (2, 1, 6, 6)
    assert int(samples.max()) < 4 and int(samples.min()) >= 0
