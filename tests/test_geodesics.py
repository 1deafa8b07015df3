"""True-geodesic module: analytic metric derivatives, exp/log maps,
energy-minimized discrete geodesics (rlvae_tpu/geometry/geodesics.py).

The reference uses straight lines everywhere it says "geodesic"
(src/models/riemannian_flow_vae.py:154-230, visualizations/interactive.py:135);
these tests pin the real differential-geometry objects this framework adds:
derivative correctness against autodiff, flatness limits, exp/log inversion,
and that energy minimization actually shortens paths under a curved metric.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlvae_tpu.geometry import metric as gm
from rlvae_tpu.geometry.geodesics import (
    christoffel,
    dg_inv,
    energy_path,
    exp_map,
    geodesic_interpolate,
    log_map,
    path_length,
)
from rlvae_tpu.geometry.metric import CentroidMetric

D = 4


@pytest.fixture(scope="module")
def flat_metric():
    # T >> spread: w_k ~ 1 everywhere -> G^{-1} constant -> flat space
    # (T=1e4: the dw/dz coefficient 2/T^2 ~ 2e-8 puts Christoffels below
    # the 1e-6 flatness gate even in fp32)
    return CentroidMetric.identity(D, n_centroids=3, temperature=1e4)


@pytest.fixture(scope="module")
def curved_metric():
    rng = np.random.default_rng(0)
    k = 6
    a = rng.normal(size=(k, D, D)).astype(np.float32) * 0.5
    mats = a @ a.transpose(0, 2, 1) + 0.3 * np.eye(D, dtype=np.float32)
    cents = rng.normal(size=(k, D)).astype(np.float32) * 1.5
    return CentroidMetric.create(cents, mats, temperature=1.2, regularization=0.05)


def test_dg_inv_matches_autodiff(curved_metric):
    z = jnp.asarray(np.random.default_rng(1).normal(size=(D,)), jnp.float32)
    got = dg_inv(curved_metric, z)  # [l, i, j]
    want = jax.jacfwd(lambda zz: gm.g_inv(curved_metric, zz[None])[0])(z)  # [i, j, l]
    np.testing.assert_allclose(got, jnp.transpose(want, (2, 0, 1)), rtol=1e-5, atol=1e-6)


def test_christoffel_symmetric_and_flat(flat_metric, curved_metric):
    z = jnp.asarray(np.random.default_rng(2).normal(size=(D,)), jnp.float32)
    gam = christoffel(curved_metric, z)
    np.testing.assert_allclose(gam, jnp.transpose(gam, (0, 2, 1)), rtol=1e-5, atol=1e-6)
    gam_flat = christoffel(flat_metric, z)
    assert float(jnp.max(jnp.abs(gam_flat))) < 1e-6


def test_exp_map_flat_is_straight(flat_metric):
    rng = np.random.default_rng(3)
    z0 = jnp.asarray(rng.normal(size=(D,)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(D,)), jnp.float32)
    z_end, path = exp_map(flat_metric, z0, v, n_steps=8, return_path=True)
    np.testing.assert_allclose(z_end, z0 + v, rtol=1e-5, atol=1e-5)
    assert path.shape == (9, D)
    # interior points lie on the straight line
    np.testing.assert_allclose(path[4], z0 + 0.5 * v, rtol=1e-4, atol=1e-4)


def test_log_exp_roundtrip(curved_metric):
    rng = np.random.default_rng(4)
    z0 = jnp.asarray(np.asarray(curved_metric.centroids)[0], jnp.float32)
    z1 = jnp.asarray(
        np.asarray(curved_metric.centroids)[1] + 0.1 * rng.normal(size=(D,)),
        jnp.float32,
    )
    v = log_map(curved_metric, z0, z1, n_steps=12, n_iters=15)
    z_hit = exp_map(curved_metric, z0, v, n_steps=12)
    np.testing.assert_allclose(z_hit, z1, rtol=1e-3, atol=1e-3)
    # the log is NOT the straight-line displacement under curvature
    assert float(jnp.linalg.norm(v - (z1 - z0))) > 1e-4


def test_energy_path_beats_linear(curved_metric):
    z0 = jnp.asarray(np.asarray(curved_metric.centroids)[0], jnp.float32)
    z1 = jnp.asarray(np.asarray(curved_metric.centroids)[2], jnp.float32)
    lin = geodesic_interpolate(curved_metric, z0, z1, n_points=12, method="linear")
    geo = energy_path(curved_metric, z0, z1, n_points=12, n_iters=150, lr=0.05)
    np.testing.assert_allclose(geo[0], z0, atol=1e-6)
    np.testing.assert_allclose(geo[-1], z1, atol=1e-6)
    l_lin = float(path_length(curved_metric, lin))
    l_geo = float(path_length(curved_metric, geo))
    assert l_geo < l_lin * 0.999, (l_geo, l_lin)


def test_batched_and_jit(curved_metric):
    rng = np.random.default_rng(5)
    z0 = jnp.asarray(rng.normal(size=(3, D)), jnp.float32)
    z1 = jnp.asarray(rng.normal(size=(3, D)), jnp.float32)
    paths = jax.jit(
        lambda a, b: energy_path(curved_metric, a, b, n_points=6, n_iters=20)
    )(z0, z1)
    assert paths.shape == (3, 6, D)
    assert bool(jnp.all(jnp.isfinite(paths)))
    lens = path_length(curved_metric, paths)
    assert lens.shape == (3,)
    v = log_map(curved_metric, z0, z1, n_steps=6, n_iters=5)
    assert v.shape == (3, D)
    ends = exp_map(curved_metric, z0, v, n_steps=6)
    assert ends.shape == (3, D)


def test_shooting_interpolation_path(curved_metric):
    z0 = jnp.asarray(np.asarray(curved_metric.centroids)[0], jnp.float32)
    z1 = jnp.asarray(np.asarray(curved_metric.centroids)[1], jnp.float32)
    path = geodesic_interpolate(
        curved_metric, z0, z1, n_points=9, method="shooting", n_steps=8, n_iters=12
    )
    assert path.shape == (9, D)
    np.testing.assert_allclose(path[0], z0, atol=1e-6)
    np.testing.assert_allclose(path[-1], z1, rtol=1e-3, atol=1e-3)
    with pytest.raises(ValueError, match="unknown geodesic method"):
        geodesic_interpolate(curved_metric, z0, z1, method="warp")


def test_model_manager_geodesic_interpolation():
    """interpolate(mode='geodesic') decodes a true-geodesic latent path."""
    from rlvae_tpu.inference import ModelManager
    from rlvae_tpu.models import RlVAE

    metric = CentroidMetric.identity(8, n_centroids=2, temperature=1.0)
    model = RlVAE(
        input_dim=(3, 8, 8), latent_dim=8, n_flows=0,
        posterior_type="gaussian", metric=metric,
    )
    mm = ModelManager(model, model.init(jax.random.PRNGKey(0), n_obs=4))
    rng = np.random.default_rng(6)
    x1 = rng.uniform(size=(3, 8, 8)).astype(np.float32)
    x2 = rng.uniform(size=(3, 8, 8)).astype(np.float32)
    out = mm.interpolate(x1, x2, n_steps=5, mode="geodesic")
    assert out.shape == (5, 3, 8, 8)
    assert np.all(np.isfinite(out))

    model_plain = RlVAE(
        input_dim=(3, 8, 8), latent_dim=8, n_flows=0, posterior_type="gaussian",
    )
    mm2 = ModelManager(model_plain, model_plain.init(jax.random.PRNGKey(0), n_obs=4))
    with pytest.raises(ValueError, match="metric"):
        mm2.interpolate(x1, x2, n_steps=3, mode="geodesic")
