"""Parity tests for the fused Pallas metric kernels (interpret mode on CPU).

Each kernel must reproduce the XLA reference implementations in
rlvae_tpu.geometry.metric, which are themselves parity-tested against the
torch reference (see test_metric.py) — transitively anchoring the kernels to
the reference formulas.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from rlvae_tpu.geometry import (
    chol_g_inv,
    g,
    g_inv,
    grad_log_sqrt_det_g_inv,
    load_metric,
    log_sqrt_det_g_inv,
    logdet_g_inv,
)
from rlvae_tpu.geometry.metric import CentroidMetric
from rlvae_tpu.ops.metric_kernels import (
    g_inv_pallas,
    hmc_terms_pallas,
    metric_bundle_pallas,
)

DATA = Path(__file__).resolve().parents[1] / "data" / "pretrained"


@pytest.fixture(scope="module", params=["metric.npz", "metric_T0.7_scaled.npz"])
def metric_and_z(request):
    metric = load_metric(DATA / request.param)
    rng = np.random.default_rng(1)
    # deliberately unaligned batch to exercise padding
    b = 37
    idx = rng.integers(0, metric.n_centroids, size=b)
    z = np.asarray(metric.centroids)[idx] + 0.1 * rng.normal(size=(b, metric.latent_dim))
    return metric, jnp.asarray(z, jnp.float32)


def test_g_inv_kernel(metric_and_z):
    metric, z = metric_and_z
    np.testing.assert_allclose(
        np.asarray(g_inv_pallas(metric, z, interpret=True)),
        np.asarray(g_inv(metric, z)),
        rtol=1e-5,
        atol=1e-6,
    )


def test_bundle_kernel(metric_and_z):
    metric, z = metric_and_z
    out = metric_bundle_pallas(metric, z, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out.g_inv), np.asarray(g_inv(metric, z)), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.chol_g_inv),
        np.asarray(chol_g_inv(metric, z, jitter=0.0)),
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.logdet_g_inv), np.asarray(logdet_g_inv(metric, z)), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.g), np.asarray(g(metric, z)), rtol=1e-3, atol=1e-3
    )
    # chol output is genuinely lower-triangular
    l = np.asarray(out.chol_g_inv)
    assert np.allclose(np.triu(l, k=1), 0.0)


def test_chol_bundle_kernel(metric_and_z):
    """The output-pruned chol-only bundle (the training hot path's kernel)
    matches the full bundle's chol/logdet outputs exactly — same in-kernel
    math, only the dead outputs dropped."""
    from rlvae_tpu.ops.metric_kernels import chol_bundle_pallas

    metric, z = metric_and_z
    full = metric_bundle_pallas(metric, z, interpret=True)
    pruned = chol_bundle_pallas(metric, z, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(pruned.chol_g_inv), np.asarray(full.chol_g_inv)
    )
    np.testing.assert_array_equal(
        np.asarray(pruned.logdet_g_inv), np.asarray(full.logdet_g_inv)
    )


def test_hmc_kernel(metric_and_z):
    metric, z = metric_and_z
    logpi, grad = hmc_terms_pallas(metric, z, interpret=True)
    np.testing.assert_allclose(
        np.asarray(logpi), np.asarray(log_sqrt_det_g_inv(metric, z)), rtol=1e-4, atol=1e-4
    )
    grad_ref = np.asarray(grad_log_sqrt_det_g_inv(metric, z))
    np.testing.assert_allclose(np.asarray(grad), grad_ref, rtol=1e-2, atol=5e-5)


def test_other_latent_dim():
    # D=8 exercises non-default slab shapes
    rng = np.random.default_rng(2)
    a = rng.normal(size=(5, 8, 8))
    mats = (a @ np.swapaxes(a, 1, 2) + 0.5 * np.eye(8)).astype(np.float32)
    metric = CentroidMetric.create(
        rng.normal(size=(5, 8)).astype(np.float32), mats, temperature=1.0, regularization=0.1
    )
    z = jnp.asarray(rng.normal(size=(9, 8)), jnp.float32)
    out = metric_bundle_pallas(metric, z, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out.g_inv), np.asarray(g_inv(metric, z)), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.g), np.asarray(g(metric, z)), rtol=1e-3, atol=1e-3
    )


def test_fused_hot_path_values_and_grads(metric_and_z):
    """chol_g_inv_fused / g_fused (the train-step entry points) match the XLA
    path in value AND gradient — both w.r.t. z and the metric params."""
    import jax

    from rlvae_tpu.geometry import metric as gm
    from rlvae_tpu.ops.metric_kernels import chol_g_inv_fused, g_fused

    metric, z = metric_and_z
    zj = jnp.asarray(z[:8])

    np.testing.assert_allclose(
        np.asarray(chol_g_inv_fused(metric, zj, 1e-6)),
        np.asarray(gm._chol_g_inv_xla(metric, zj, 1e-6)),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(g_fused(metric, zj)), np.asarray(gm._g_xla(metric, zj)),
        rtol=1e-5, atol=1e-5,
    )

    def loss_f(m, zz):
        return jnp.sum(jnp.sin(chol_g_inv_fused(m, zz, 1e-6))) + jnp.sum(g_fused(m, zz))

    def loss_x(m, zz):
        return jnp.sum(jnp.sin(gm._chol_g_inv_xla(m, zz, 1e-6))) + jnp.sum(gm._g_xla(m, zz))

    gf = jax.grad(loss_f, argnums=(0, 1))(metric, zj)
    gx = jax.grad(loss_x, argnums=(0, 1))(metric, zj)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_bundle_mxu_distance_arm_parity():
    """The centered-MXU distance expansion (mxu_dist=True, VERDICT r2 item
    8) must match the exact difference-form arm within fp32 cancellation
    noise — centering shrinks the expansion's error scale from |z|^2 to the
    centroid spread (ops/metric_kernels._weights_slab_mxu)."""
    metric = load_metric(DATA / "metric.npz")
    rng = np.random.default_rng(0)
    idx = rng.integers(0, metric.n_centroids, size=128)
    z = jnp.asarray(
        np.asarray(metric.centroids)[idx] + 0.1 * rng.normal(size=(128, 16)),
        jnp.float32,
    )
    a = metric_bundle_pallas(metric, z, mxu_dist=False)
    b = metric_bundle_pallas(metric, z, mxu_dist=True)
    scale = float(np.abs(np.asarray(a.g_inv)).max())
    assert np.abs(np.asarray(a.g_inv) - np.asarray(b.g_inv)).max() / scale < 1e-5
    np.testing.assert_allclose(
        np.asarray(a.logdet_g_inv), np.asarray(b.logdet_g_inv), atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(a.g), np.asarray(b.g), atol=1e-4)


# ---------------------------------------------------------------------------
# K-chunked regime (large centroid banks)
# ---------------------------------------------------------------------------


def _synthetic_metric(k, d=16, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.normal(size=(k, d)).astype(np.float32)
    a = np.eye(d, dtype=np.float32)[None].repeat(k, 0)
    a += 0.1 * rng.normal(size=(k, d, d)).astype(np.float32)
    m = np.einsum("kij,klj->kil", a, a)  # SPD
    metric = CentroidMetric.create(c, m, temperature=0.5, regularization=0.01)
    idx = rng.integers(0, k, size=37)  # unaligned batch exercises padding
    z = jnp.asarray(c[idx] + 0.1 * rng.normal(size=(37, d)), jnp.float32)
    return metric, z


def test_plan_envelope():
    """The kernel plan must honor the envelope MEASURED on the chip
    (scripts/_probe_k_envelope.py): at D=16, K=2000 compiles only at
    TB<=128 resident; K=5000 needs the chunked kernel; the HMC kernels
    carry two matrix slabs and chunk already at K=2000."""
    from rlvae_tpu.ops.metric_kernels import _plan

    assert _plan(8192, 16, 200, None) == (512, None)        # small bank: as before
    tb, kc = _plan(8192, 16, 2000, None)
    assert (tb, kc) == (128, None)                           # clamped resident
    tb, kc = _plan(8192, 16, 2000, 512)                      # explicit big TB
    assert kc is not None                                    # -> chunked
    tb, kc = _plan(8192, 16, 5000, None)
    assert kc is not None                                    # beyond resident
    tb, kc = _plan(8192, 16, 2000, None, n_m=2)              # HMC: 2 slabs
    assert kc is not None
    # chunked TB stays bounded (the [KC, TB] temporaries own VMEM)
    assert _plan(65536, 16, 50000, None)[0] <= 512


def test_chunked_kernels_match_xla():
    """Every chunked kernel (forced via an out-of-envelope explicit TB at
    K=2000) must match the XLA reference path at fp32 accuracy, including
    the non-2^n bank padding and the accumulate-then-epilogue split."""
    from rlvae_tpu.geometry import metric as gm
    from rlvae_tpu.ops.metric_kernels import (
        chol_bundle_pallas,
        hmc_partials_pallas,
    )

    metric, z = _synthetic_metric(2000)
    out = metric_bundle_pallas(metric, z, tb=512, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out.g_inv), np.asarray(g_inv(metric, z)), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.chol_g_inv), np.asarray(chol_g_inv(metric, z)),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.logdet_g_inv), np.asarray(logdet_g_inv(metric, z)),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.g), np.asarray(g(metric, z)), rtol=1e-5, atol=1e-5)
    cb = chol_bundle_pallas(metric, z, tb=512, interpret=True)
    np.testing.assert_allclose(
        np.asarray(cb.chol_g_inv), np.asarray(chol_g_inv(metric, z)),
        rtol=1e-5, atol=1e-5)
    gi = g_inv_pallas(metric, z, tb=512, interpret=True)
    np.testing.assert_allclose(
        np.asarray(gi), np.asarray(g_inv(metric, z)), rtol=1e-5, atol=1e-6)
    lp, gr = hmc_terms_pallas(metric, z, tb=512, interpret=True)
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(log_sqrt_det_g_inv(metric, z)),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gr), np.asarray(grad_log_sqrt_det_g_inv(metric, z)),
        rtol=1e-5, atol=1e-5)
    gi_p, v_p = hmc_partials_pallas(metric, z, tb=512, interpret=True)
    gi_ref = g_inv(metric, z) - metric.regularization * jnp.eye(16)
    np.testing.assert_allclose(
        np.asarray(gi_p), np.asarray(gi_ref), rtol=1e-5, atol=1e-6)


def test_fused_supported_k_unbounded():
    """Large-K banks stay on the fused path (chunked regime); only large
    latent dims fall back to XLA."""
    from rlvae_tpu.ops.metric_kernels import fused_supported

    big_k, _ = _synthetic_metric(3000, d=16)
    assert fused_supported(big_k)
    big_d = CentroidMetric.create(
        np.zeros((4, 48), np.float32),
        np.eye(48, dtype=np.float32)[None].repeat(4, 0),
        temperature=0.5, regularization=0.01,
    )
    assert not fused_supported(big_d)
