"""Centroid-sharded (expert-parallel) metric path: parity vs the dense path.

The bank is padded to the shard count and split over the mesh's ``model``
axis; these tests pin that every sharded output matches the single-device
dense computation exactly, on both a pure-EP mesh (1 x 8) and a hybrid
DP x EP mesh (2 x 4) with the batch sharded over ``data``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlvae_tpu.geometry import metric as gm
from rlvae_tpu.parallel import metric_parallel as mp
from rlvae_tpu.parallel.mesh import create_mesh


@pytest.fixture(scope="module")
def bank(rng):
    d, k = 6, 37  # K deliberately NOT divisible by any mesh axis size
    c = rng.normal(size=(k, d)).astype(np.float32)
    a = rng.normal(size=(k, d, d)).astype(np.float32) * 0.3
    m = a @ a.transpose(0, 2, 1) + 0.5 * np.eye(d, dtype=np.float32)
    return gm.CentroidMetric.create(c, m, temperature=0.8, regularization=0.01)


@pytest.fixture(scope="module")
def zs(rng, bank):
    # points near the centroids so the weights are far from underflow
    idx = rng.integers(0, bank.n_centroids, size=16)
    base = np.asarray(bank.centroids)[idx]
    return jnp.asarray(base + 0.3 * rng.normal(size=base.shape).astype(np.float32))


def test_pad_metric_is_exact(bank, zs):
    padded = mp.pad_metric(bank, 8)
    assert padded.n_centroids == 40
    np.testing.assert_allclose(
        gm.g_inv(padded, zs), gm.g_inv(bank, zs), rtol=0, atol=0
    )
    # grad path also unaffected up to the reduction-tree reordering the
    # padded K=40 einsum introduces (padded contributions are exact zeros)
    np.testing.assert_allclose(
        gm.grad_log_sqrt_det_g_inv(padded, zs),
        gm.grad_log_sqrt_det_g_inv(bank, zs),
        rtol=0,
        atol=1e-6,
    )


@pytest.mark.parametrize("mp_size,batch_axis", [(8, None), (4, "data"), (2, "data")])
def test_g_inv_sharded_parity(bank, zs, mp_size, batch_axis):
    mesh = create_mesh(model_parallel=mp_size)
    sharded = mp.shard_metric(mesh, bank)
    got = mp.g_inv_sharded(mesh, sharded, zs, batch_axis=batch_axis)
    want = gm.g_inv(bank, zs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-6)


def test_chol_sharded_parity(bank, zs):
    mesh = create_mesh(model_parallel=4)
    sharded = mp.shard_metric(mesh, bank)
    got = mp.chol_g_inv_sharded(mesh, sharded, zs, jitter=1e-6)
    want = gm.chol_g_inv(bank, zs, jitter=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-6)


@pytest.mark.slow  # 60-90s each on the 1-core host (measured r4 --durations)
def test_hmc_terms_sharded_parity(bank, zs):
    mesh = create_mesh(model_parallel=4)
    sharded = mp.shard_metric(mesh, bank)
    logpi, grad = mp.hmc_terms_sharded(mesh, sharded, zs)
    want_logpi = gm.log_sqrt_det_g_inv(bank, zs)
    want_grad = gm.grad_log_sqrt_det_g_inv(bank, zs)
    np.testing.assert_allclose(np.asarray(logpi), np.asarray(want_logpi), atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(want_grad), atol=1e-5)


def test_sharded_is_jittable_with_constant_collective_count(bank, zs):
    """The EP path must stay a single fused psum under jit (no per-centroid
    collectives), and jit must reproduce the eager result."""
    mesh = create_mesh(model_parallel=4)
    sharded = mp.shard_metric(mesh, bank)

    fn = jax.jit(lambda m, z: mp.hmc_terms_sharded(mesh, m, z))
    logpi, grad = fn(sharded, zs)
    np.testing.assert_allclose(
        np.asarray(logpi), np.asarray(gm.log_sqrt_det_g_inv(bank, zs)), atol=1e-6
    )
    import re

    hlo = fn.lower(sharded, zs).compile().as_text()
    # count all-reduce OPS (each `%name = (...) all-reduce(...)` line), not the
    # get-tuple-element references to them
    n_reduce = len(re.findall(r"= .*\ball-reduce(?:-start)?\(", hlo))
    assert n_reduce == 1, f"expected ONE fused psum, saw {n_reduce} all-reduce ops"


@pytest.mark.slow  # 60-90s each on the 1-core host (measured r4 --durations)
def test_sharded_prior_chain_matches_dense(bank):
    """Distributed HMC generation must reproduce the dense sampler: same
    inits, bit-identical noise (shared draw_chain_noise derivation), terms
    differing only by psum reduction order."""
    from rlvae_tpu.samplers.hmc import HMCConfig, sample_prior_hmc

    cfg = HMCConfig(mcmc_steps=6, n_lf=3, eps_lf=0.05, init="centroids")
    key = jax.random.PRNGKey(7)
    dense_z, dense_diag = sample_prior_hmc(bank, key, 8, cfg, return_diagnostics=True)

    mesh = create_mesh(model_parallel=2)  # dp=4 x ep=2
    shard_z, shard_diag = mp.sample_prior_hmc_sharded(
        mesh, bank, key, 8, cfg, return_diagnostics=True
    )
    np.testing.assert_allclose(np.asarray(shard_z), np.asarray(dense_z), atol=1e-4)
    np.testing.assert_allclose(
        float(shard_diag["accept_rate"]), float(dense_diag["accept_rate"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(shard_diag["log_pi"]), np.asarray(dense_diag["log_pi"]), atol=1e-4
    )


@pytest.mark.slow  # 60-90s each on the 1-core host (measured r4 --durations)
def test_sharded_prior_chain_randn_init(bank):
    from rlvae_tpu.samplers.hmc import HMCConfig, sample_prior_hmc

    cfg = HMCConfig(mcmc_steps=4, n_lf=2, eps_lf=0.05, init="randn", beta_zero=0.7)
    key = jax.random.PRNGKey(11)
    dense_z = sample_prior_hmc(bank, key, 16, cfg)
    mesh = create_mesh(model_parallel=4)  # dp=2 x ep=4
    shard_z = mp.sample_prior_hmc_sharded(mesh, bank, key, 16, cfg)
    np.testing.assert_allclose(np.asarray(shard_z), np.asarray(dense_z), atol=1e-4)


def test_sharded_prior_chain_rejects_indivisible(bank):
    from rlvae_tpu.samplers.hmc import HMCConfig

    mesh = create_mesh(model_parallel=2)
    with pytest.raises(ValueError, match="divide"):
        mp.sample_prior_hmc_sharded(mesh, bank, jax.random.PRNGKey(0), 7, HMCConfig())


def test_pallas_partials_match_xla(bank, zs):
    """The fused partial-terms kernel (interpret mode off-TPU) must match the
    XLA partials: G^{-1} partial without + lbd I and the scaled gradient
    contraction."""
    from rlvae_tpu.ops.metric_kernels import hmc_partials_pallas

    gi_k, v_k = hmc_partials_pallas(bank, zs)
    w = gm.weights(bank, zs)
    gi_x = jnp.einsum("bk,kij->bij", w, bank.matrices)
    diff = bank.centroids[None, :, :] - zs[:, None, :]
    v_x = (-2.0 / bank.temperature**2) * jnp.einsum("bk,bki,kij->bj", w, diff, bank.matrices)
    np.testing.assert_allclose(np.asarray(gi_k), np.asarray(gi_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_x), atol=1e-4)


@pytest.mark.slow  # 60-90s each on the 1-core host (measured r4 --durations)
def test_hmc_terms_sharded_pallas_backend(bank, zs):
    """backend='pallas' (interpret mode on CPU) inside shard_map reproduces
    the dense terms — the kernel composes with the EP decomposition."""
    mesh = create_mesh(model_parallel=2)
    sharded = mp.shard_metric(mesh, bank)
    logpi, grad = mp.hmc_terms_sharded(mesh, sharded, zs, backend="pallas")
    np.testing.assert_allclose(
        np.asarray(logpi), np.asarray(gm.log_sqrt_det_g_inv(bank, zs)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(gm.grad_log_sqrt_det_g_inv(bank, zs)), atol=1e-4
    )
