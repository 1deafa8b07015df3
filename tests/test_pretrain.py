"""RHVAE metric pre-training tests (reference: pythae rhvae_model.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlvae_tpu.geometry import g_inv
from rlvae_tpu.geometry.pretrain import RHVAE, MetricMLP, train_metric


def test_metric_mlp_cholesky_structure():
    net = MetricMLP(input_dim=(3, 4, 4), latent_dim=6)
    x = jnp.ones((3, 3, 4, 4))
    variables = net.init(jax.random.PRNGKey(0), x)
    l_mat = net.apply(variables, x)
    assert l_mat.shape == (3, 6, 6)
    l_np = np.asarray(l_mat)
    # strictly upper part zero, diagonal strictly positive (exp)
    assert np.allclose(np.triu(l_np, k=1), 0.0)
    assert (np.diagonal(l_np, axis1=1, axis2=2) > 0).all()


@pytest.fixture(scope="module")
def tiny_rhvae():
    return RHVAE(input_dim=(3, 4, 4), latent_dim=4, n_lf=2, eps_lf=1e-3)


@pytest.mark.slow
def test_forward_finite(tiny_rhvae):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(4, 3, 4, 4)), jnp.float32)
    params = tiny_rhvae.init(jax.random.PRNGKey(0))["params"]
    out = tiny_rhvae.forward(params, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(out.loss))
    assert out.z.shape == (4, 4)
    assert out.m_mats.shape == (4, 4, 4)
    # leapfrog moved the latents
    assert not np.allclose(np.asarray(out.z), np.asarray(out.z0))
    # training objective is differentiable end-to-end (incl. metric net)
    g = jax.grad(lambda p: tiny_rhvae.forward(p, x, jax.random.PRNGKey(1)).loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(a)).all() for a in leaves)
    assert any(np.abs(np.asarray(a)).max() > 0 for a in jax.tree_util.tree_leaves(g["metric"]))


def test_train_metric_end_to_end(tiny_rhvae):
    rng = np.random.default_rng(1)
    data = rng.uniform(size=(32, 3, 4, 4)).astype(np.float32)
    metric, info = train_metric(
        tiny_rhvae, data, n_epochs=2, batch_size=8, learning_rate=1e-3, seed=0
    )
    # ring buffer consolidated: centroids from the last <=100 batches
    assert metric.centroids.shape[1] == 4
    assert metric.n_centroids == 8 * min(2 * 4, 100)  # batches x batch_size
    assert np.isfinite(info["loss_history"]).all()
    # the learned metric is usable by the geometry stack
    z = jnp.asarray(rng.normal(size=(5, 4)), jnp.float32)
    gi = np.asarray(g_inv(metric, z))
    assert np.isfinite(gi).all()
    eig = np.linalg.eigvalsh(gi)
    assert (eig > 0).all()  # SPD by construction (LL^T + lbd I)


def test_ring_buffer_cap():
    rhvae = RHVAE(input_dim=(1, 2, 2), latent_dim=2, n_lf=1)
    rhvae.buffer_maxlen = 3
    for i in range(5):
        rhvae.record_batch(np.eye(2)[None], np.zeros((1, 2)) + i)
    assert len(rhvae.buffer_m) == 3
    metric = rhvae.consolidate_metric()
    assert metric.n_centroids == 3
    np.testing.assert_array_equal(np.asarray(metric.centroids)[:, 0], [2, 3, 4])
