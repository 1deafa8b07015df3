"""Golden-value and parity tests for the centroid metric (rlvae_tpu.geometry).

Three tiers, mirroring the reference's own test strategy
(reference: tests/test_modular_components.py:29-231):
  1. formula parity against an independent float64 numpy implementation,
  2. direct parity against the reference's torch closures (pythae
     rhvae_utils.create_metric / create_inverse_metric) on the real
     pretrained metric artifacts,
  3. structural identities (G G^-1 = I, logdet consistency).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlvae_tpu.geometry import (
    CentroidMetric,
    load_metric,
    g,
    g_inv,
    grad_log_sqrt_det_g_inv,
    log_sqrt_det_g_inv,
    logdet_g,
    dist2,
    weights,
)

DATA = Path(__file__).resolve().parents[1] / "data" / "pretrained"


def numpy_g_inv(centroids, matrices, temperature, lbd, z):
    """Independent fp64 implementation of the reference formula
    (metric_tensor.py:98-137)."""
    diff = centroids[None, :, :] - z[:, None, :]
    d2 = np.sum(diff**2, axis=-1)
    w = np.exp(-d2 / temperature**2)
    gi = np.einsum("bk,kij->bij", w, matrices)
    return gi + lbd * np.eye(centroids.shape[1])


@pytest.fixture(scope="module", params=["metric.npz", "metric_T0.7_scaled.npz"])
def metric_and_z(request):
    metric = load_metric(DATA / request.param)
    rng = np.random.default_rng(0)
    # sample test points near the centroids (where the metric is non-trivial)
    idx = rng.integers(0, metric.n_centroids, size=32)
    z = np.asarray(metric.centroids)[idx] + 0.1 * rng.normal(size=(32, metric.latent_dim))
    return metric, z.astype(np.float32)


def test_g_inv_matches_fp64_formula(metric_and_z):
    metric, z = metric_and_z
    gi = np.asarray(g_inv(metric, jnp.asarray(z)))
    gold = numpy_g_inv(
        np.asarray(metric.centroids, np.float64),
        np.asarray(metric.matrices, np.float64),
        float(metric.temperature),
        float(metric.regularization),
        z.astype(np.float64),
    )
    np.testing.assert_allclose(gi, gold, rtol=1e-5, atol=1e-5)


def test_g_is_inverse(metric_and_z):
    metric, z = metric_and_z
    gz = np.asarray(g(metric, jnp.asarray(z)))
    giz = np.asarray(g_inv(metric, jnp.asarray(z)))
    ident = np.einsum("bij,bjk->bik", gz, giz)
    err = np.abs(ident - np.eye(metric.latent_dim)).max()
    assert err < 1e-3, f"G @ G_inv deviates from I by {err}"


def test_logdet_consistency(metric_and_z):
    metric, z = metric_and_z
    ld = np.asarray(logdet_g(metric, jnp.asarray(z)))
    gold = numpy_g_inv(
        np.asarray(metric.centroids, np.float64),
        np.asarray(metric.matrices, np.float64),
        float(metric.temperature),
        float(metric.regularization),
        z.astype(np.float64),
    )
    _, gold_ld = np.linalg.slogdet(gold)
    np.testing.assert_allclose(ld, -gold_ld, rtol=1e-3, atol=1e-3)


def test_weights_bounds(metric_and_z):
    metric, z = metric_and_z
    w = np.asarray(weights(metric, jnp.asarray(z)))
    assert w.shape == (32, metric.n_centroids)
    assert (w >= 0).all() and (w <= 1.0 + 1e-6).all()
    # exactly at a centroid the self-weight is exp(0) = 1
    w_at_c = np.asarray(weights(metric, metric.centroids[:8]))
    np.testing.assert_allclose(w_at_c[np.arange(8), np.arange(8)], 1.0, atol=1e-6)


def test_dist2_properties(metric_and_z):
    metric, z = metric_and_z
    z1, z2 = jnp.asarray(z), jnp.asarray(np.roll(z, 1, axis=0))
    d = np.asarray(dist2(metric, z1, z2))
    assert (d >= 0).all()
    d_sym = np.asarray(dist2(metric, z2, z1))
    np.testing.assert_allclose(d, d_sym, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dist2(metric, z1, z1)), 0.0, atol=1e-5)


def test_jit_and_vmap_compose(metric_and_z):
    metric, z = metric_and_z
    f = jax.jit(lambda m, x: g_inv(m, x))
    np.testing.assert_allclose(
        np.asarray(f(metric, jnp.asarray(z))), np.asarray(g_inv(metric, jnp.asarray(z))),
        rtol=1e-6, atol=1e-6,
    )
    # grad flows through the metric params (they are trainable)
    loss = lambda m: jnp.sum(log_sqrt_det_g_inv(m, jnp.asarray(z[:4])))
    grads = jax.grad(lambda m: loss(m))(metric)
    assert np.isfinite(np.asarray(grads.matrices)).all()


# ---------------------------------------------------------------------------
# Direct parity vs the reference torch closures
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def torch_reference():
    pytest.importorskip("torch")
    from tests.reference_utils import import_pythae

    import_pythae()
    from pythae.models.rhvae.rhvae_utils import create_inverse_metric, create_metric
    from pythae.samplers.manifold_sampler.rhvae_sampler import RHVAESampler

    return create_metric, create_inverse_metric, RHVAESampler


def test_parity_vs_reference_closures(metric_and_z, torch_reference, reference_available):
    if not reference_available:
        pytest.skip("reference checkout not mounted")
    import torch

    from tests.reference_utils import TorchMetricModel

    create_metric, create_inverse_metric, RHVAESampler = torch_reference
    metric, z = metric_and_z
    model = TorchMetricModel(
        np.asarray(metric.centroids),
        np.asarray(metric.matrices),
        float(metric.temperature),
        float(metric.regularization),
    )
    zt = torch.as_tensor(z)

    gi_ref = create_inverse_metric(model)(zt).numpy()
    gi_ours = np.asarray(g_inv(metric, jnp.asarray(z)))
    np.testing.assert_allclose(gi_ours, gi_ref, rtol=1e-4, atol=1e-5)

    g_ref = create_metric(model)(zt).numpy()
    g_ours = np.asarray(g(metric, jnp.asarray(z)))
    np.testing.assert_allclose(g_ours, g_ref, rtol=2e-3, atol=1e-4)

    # HMC target log-density and its (pythae-form) gradient
    logpi_ref = RHVAESampler.log_sqrt_det_G_inv(zt, model).numpy()
    logpi_ours = np.asarray(log_sqrt_det_g_inv(metric, jnp.asarray(z)))
    np.testing.assert_allclose(logpi_ours, logpi_ref, rtol=1e-3, atol=1e-3)

    # the reference leaves a trailing singleton dim and reshapes at call sites
    # (rhvae_sampler.py:114-116)
    grad_ref = RHVAESampler.grad_log_sqrt_det_G_inv(zt, model).numpy().reshape(z.shape)
    grad_ours = np.asarray(grad_log_sqrt_det_g_inv(metric, jnp.asarray(z)))
    np.testing.assert_allclose(grad_ours, grad_ref, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_gaussian_curvature_flat_metric():
    """An identity (flat) metric has zero curvature; a real centroid metric
    is curved near its centroids."""
    import jax.numpy as jnp2

    from rlvae_tpu.geometry.curvature import gaussian_curvature_2d
    from rlvae_tpu.geometry.metric import CentroidMetric

    # flat: single identity matrix with enormous temperature -> G ~ const
    flat = CentroidMetric.identity(4, n_centroids=1, temperature=1e6, regularization=1.0)
    basis = jnp2.eye(4)[:, :2]
    origin = jnp2.zeros(4)
    pts = jnp2.asarray(np.random.default_rng(0).normal(size=(16, 2)), jnp2.float32)
    k_flat = np.asarray(gaussian_curvature_2d(flat, basis, origin, pts))
    np.testing.assert_allclose(k_flat, 0.0, atol=1e-4)

    metric = load_metric(DATA / "metric_T0.7_scaled.npz")
    basis = jnp2.eye(16)[:, :2]
    origin = metric.centroids[0]
    pts = jnp2.asarray(np.random.default_rng(1).normal(size=(16, 2)) * 0.3, jnp2.float32)
    k_curved = np.asarray(gaussian_curvature_2d(metric, basis, origin, pts))
    assert np.isfinite(k_curved).all()
    assert np.abs(k_curved).max() > 1e-4  # genuinely curved
