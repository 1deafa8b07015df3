"""Sampler tests: statistical properties + HMC chain behavior.

The HMC tempering schedule and chain structure are parity-anchored to pythae
(reference: pythae samplers/manifold_sampler/rhvae_sampler.py:98-155).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlvae_tpu.geometry import load_metric
from rlvae_tpu.samplers import (
    HMCConfig,
    refine_for_training,
    reparam,
    sample_metric_aware_posterior,
    sample_posterior,
    sample_posterior_hmc,
    sample_prior,
    sample_prior_hmc,
    tempering,
)

DATA = Path(__file__).resolve().parents[1] / "data" / "pretrained"


@pytest.fixture(scope="module")
def metric():
    return load_metric(DATA / "metric_T0.7_scaled.npz")


@pytest.fixture(scope="module")
def mu_lv():
    rng = np.random.default_rng(0)
    return (
        jnp.asarray(rng.normal(size=(16, 16)), jnp.float32),
        jnp.asarray(rng.normal(size=(16, 16)) * 0.1 - 1.0, jnp.float32),
    )


def test_reparam_statistics():
    mu = jnp.zeros((4096, 8))
    lv = jnp.zeros((4096, 8))
    z = reparam(jax.random.PRNGKey(0), mu, lv)
    assert abs(float(z.mean())) < 0.05
    assert abs(float(z.std()) - 1.0) < 0.05


def test_posterior_methods_finite(metric, mu_lv):
    mu, lv = mu_lv
    for method in ("standard", "basic", "enhanced", "geodesic", "official"):
        z = sample_posterior(metric, jax.random.PRNGKey(1), mu, lv, method)
        assert z.shape == mu.shape
        assert np.isfinite(np.asarray(z)).all(), method


def test_metric_aware_posterior_covariance(metric):
    """z0 = mu + L eps with L L^T = G^{-1}(mu): empirical covariance -> G^{-1}."""
    from rlvae_tpu.geometry import g_inv

    mu = jnp.tile(metric.centroids[:1], (8192, 1))
    lv = jnp.zeros_like(mu)
    z = sample_metric_aware_posterior(metric, jax.random.PRNGKey(2), mu, lv)
    emp_cov = np.cov(np.asarray(z - mu).T)
    expected = np.asarray(g_inv(metric, metric.centroids[:1]))[0]
    np.testing.assert_allclose(emp_cov, expected, atol=0.15 * np.abs(expected).max() + 0.05)


def test_prior_methods(metric):
    for method in ("geodesic", "geodesic_exact", "centroid_aware",
                   "weighted_mixture", "basic"):
        z = sample_prior(metric, jax.random.PRNGKey(3), 32, metric.latent_dim, method)
        assert z.shape == (32, 16)
        assert np.isfinite(np.asarray(z)).all(), method
    z = sample_prior(None, jax.random.PRNGKey(3), 32, 16, "geodesic")
    assert z.shape == (32, 16)


def test_prior_geodesic_exact_rides_true_paths(metric):
    """geodesic_exact draws from TRUE energy-minimized geodesics: with the
    same key its base points differ from the linear-interpolation method's
    wherever the metric bends paths, while both stay on the same centroid
    pairs (identical index/noise key derivation)."""
    key = jax.random.PRNGKey(7)
    z_lin = sample_prior(metric, key, 64, metric.latent_dim, "geodesic")
    z_exact = sample_prior(metric, key, 64, metric.latent_dim, "geodesic_exact")
    assert np.isfinite(np.asarray(z_exact)).all()
    # same pair/noise keys, different path geometry -> samples must differ
    # (under the real pretrained metric the paths are genuinely curved)
    assert float(jnp.max(jnp.abs(z_exact - z_lin))) > 1e-3


def test_tempering_schedule():
    b0_sqrt = jnp.sqrt(jnp.asarray(4.0))
    # k=K -> beta_k = 1 -> returns 1
    np.testing.assert_allclose(float(tempering(15.0, 15, b0_sqrt)), 1.0, rtol=1e-6)
    # k=0 -> 1/(1/sqrt(b0)) = sqrt(b0)
    np.testing.assert_allclose(float(tempering(0.0, 15, b0_sqrt)), 2.0, rtol=1e-6)
    # interior points pin the QUADRATIC shape (pythae rhvae_sampler.py:
    # 152-155: beta_k = (1 - 1/sqrt(b0)) (k/K)^2 + 1/sqrt(b0)) — the
    # endpoints alone are satisfied by any monotone interpolation
    for k in (5.0, 7.5, 12.0):
        expected = 1.0 / ((1.0 - 0.5) * (k / 15.0) ** 2 + 0.5)
        np.testing.assert_allclose(
            float(tempering(k, 15, b0_sqrt)), expected, rtol=1e-6
        )


def test_hmc_prior_chain(metric):
    cfg = HMCConfig(mcmc_steps=5, n_lf=3, backend="xla")
    z = sample_prior_hmc(metric, jax.random.PRNGKey(4), 8, cfg)
    assert z.shape == (8, 16)
    assert np.isfinite(np.asarray(z)).all()
    # chain moves toward high sqrt(det G^{-1}) regions: samples stay near the
    # centroid cloud rather than diverging
    dist = np.linalg.norm(
        np.asarray(z)[:, None, :] - np.asarray(metric.centroids)[None], axis=-1
    ).min(axis=1)
    assert dist.max() < 20.0


def test_hmc_randn_init(metric):
    cfg = HMCConfig(mcmc_steps=2, n_lf=2, init="randn", backend="xla")
    z = sample_prior_hmc(metric, jax.random.PRNGKey(5), 4, cfg)
    assert np.isfinite(np.asarray(z)).all()


def test_hmc_posterior_and_refine(metric, mu_lv):
    mu, lv = mu_lv
    z = sample_posterior_hmc(metric, jax.random.PRNGKey(6), mu, lv, n_steps=2, n_lf=2, backend="xla")
    assert z.shape == mu.shape and np.isfinite(np.asarray(z)).all()
    z = refine_for_training(metric, jax.random.PRNGKey(7), mu, lv, backend="xla")
    assert z.shape == mu.shape and np.isfinite(np.asarray(z)).all()


def test_hmc_jit_compiles_once(metric):
    cfg = HMCConfig(mcmc_steps=3, n_lf=2, backend="xla")
    f = jax.jit(lambda key: sample_prior_hmc(metric, key, 8, cfg))
    z1 = f(jax.random.PRNGKey(8))
    z2 = f(jax.random.PRNGKey(9))
    assert not np.allclose(np.asarray(z1), np.asarray(z2))


def test_hmc_targets_density(metric):
    """Chain samples concentrate where sqrt(det G^{-1}) is large: their mean
    target log-density beats uniform draws over the centroid bounding box.

    (Far from the centroids the target plateaus at log(1e-10) with zero
    gradient — the pythae guard semantics — which is exactly why the official
    sampler starts its chains AT the centroids, rhvae_sampler.py:100-102.)"""
    from rlvae_tpu.geometry import log_sqrt_det_g_inv

    key = jax.random.PRNGKey(11)
    cfg = HMCConfig(mcmc_steps=15, n_lf=5, init="centroids", backend="xla")
    z = sample_prior_hmc(metric, key, 64, cfg)
    lo = jnp.min(metric.centroids, axis=0)
    hi = jnp.max(metric.centroids, axis=0)
    uniform = jax.random.uniform(
        jax.random.PRNGKey(12), (64, metric.latent_dim), minval=lo, maxval=hi
    )
    logpi_chain = float(jnp.mean(log_sqrt_det_g_inv(metric, z)))
    logpi_uniform = float(jnp.mean(log_sqrt_det_g_inv(metric, uniform)))
    assert logpi_chain > logpi_uniform + 1.0, (logpi_chain, logpi_uniform)


def test_posterior_hmc_runs_on_pallas_backend(metric):
    """sample_posterior_hmc must work with the fused-kernel terms backend:
    the kernel has no VJP, so the energy gradient is assembled analytically
    (round-3 review fix — autodiff through the Pallas call crashed at trace
    time on TPU, where backend='auto' selects it)."""
    from rlvae_tpu.samplers.hmc import sample_posterior_hmc

    rng = np.random.default_rng(0)
    mu = jnp.asarray(rng.normal(size=(6, metric.latent_dim)), jnp.float32)
    lv = jnp.asarray(rng.normal(scale=0.2, size=mu.shape), jnp.float32)
    z_p = sample_posterior_hmc(metric, jax.random.PRNGKey(0), mu, lv,
                               n_steps=3, backend="pallas")
    z_x = sample_posterior_hmc(metric, jax.random.PRNGKey(0), mu, lv,
                               n_steps=3, backend="xla")
    assert np.isfinite(np.asarray(z_p)).all()
    # identical keys + identical analytic gradients -> same chains up to
    # backend numerics
    np.testing.assert_allclose(np.asarray(z_p), np.asarray(z_x),
                               rtol=1e-3, atol=1e-4)


def test_adaptive_hmc_tunes_acceptance(metric):
    """Dual-averaging adaptation (method='adaptive', beyond-reference —
    VERDICT r3 item 2) must pull the post-warmup acceptance toward the 0.65
    target on the REAL pre-trained metric, where the reference's fixed
    eps=0.03 chain accepts ~4.7% (outputs/generation_parity/summary.json)."""
    from rlvae_tpu.samplers import sample_prior_hmc_adaptive

    cfg = HMCConfig(mcmc_steps=80, n_lf=15, init="centroids", backend="xla")
    zs, diag = sample_prior_hmc_adaptive(
        metric, jax.random.PRNGKey(3), 64, cfg, warmup=40, return_chain=True
    )
    assert zs.shape == (80, 64, metric.latent_dim)
    assert np.isfinite(np.asarray(zs)).all()
    rate = float(diag["accept_rate"])
    # adaptation target is 0.65; a short 40-step warmup lands in a band
    assert 0.35 < rate < 0.95, rate
    # per-chain eps: one tuned step size per chain, all positive
    eps = np.asarray(diag["eps_final"])
    assert eps.shape == (64,)
    assert (eps > 0).all()
    # final draw API returns just the samples
    z_last = sample_prior_hmc_adaptive(
        metric, jax.random.PRNGKey(3), 16, cfg, warmup=40
    )
    assert z_last.shape == (16, metric.latent_dim)


def test_adaptive_hmc_targets_density(metric):
    """The adaptive chain samples the same pi(z) ~ sqrt(det G^{-1}) target
    as the official chain: post-warmup draws concentrate in high-density
    regions vs a uniform reference cloud."""
    from rlvae_tpu.geometry.metric import log_sqrt_det_g_inv
    from rlvae_tpu.samplers import sample_prior_hmc_adaptive

    cfg = HMCConfig(mcmc_steps=80, n_lf=15, init="centroids", backend="xla")
    z = sample_prior_hmc_adaptive(metric, jax.random.PRNGKey(5), 64, cfg,
                                  warmup=40)
    lo = jnp.min(metric.centroids, axis=0)
    hi = jnp.max(metric.centroids, axis=0)
    uniform = jax.random.uniform(
        jax.random.PRNGKey(6), (64, metric.latent_dim), minval=lo, maxval=hi
    )
    logpi_chain = float(jnp.mean(log_sqrt_det_g_inv(metric, z)))
    logpi_uniform = float(jnp.mean(log_sqrt_det_g_inv(metric, uniform)))
    assert logpi_chain > logpi_uniform + 1.0, (logpi_chain, logpi_uniform)


def test_effective_sample_size():
    """ESS estimator sanity (utils/mcmc.py): iid chains -> ESS ~ S*B;
    strongly autocorrelated chains -> ESS far below; shapes [S,B] and
    [S,B,D] both accepted."""
    from rlvae_tpu.utils.mcmc import effective_sample_size, ess_1d

    rng = np.random.default_rng(0)
    s, b = 512, 8
    iid = rng.normal(size=(s, b))
    ess_iid = effective_sample_size(iid)
    assert ess_iid > 0.5 * s * b, ess_iid

    # AR(1) with phi=0.95 -> tau ~ (1+phi)/(1-phi) = 39 -> ESS ~ S*B/39
    ar = np.empty((s, b))
    ar[0] = rng.normal(size=b)
    for t in range(1, s):
        ar[t] = 0.95 * ar[t - 1] + rng.normal(size=b) * np.sqrt(1 - 0.95**2)
    ess_ar = effective_sample_size(ar)
    assert ess_ar < 0.15 * s * b, ess_ar
    assert ess_ar < ess_iid / 4

    # 3-D input: min over dims; constant dim guard doesn't blow up
    three = rng.normal(size=(s, b, 3))
    assert effective_sample_size(three) > 0.3 * s * b
    assert ess_1d(np.zeros(64)) >= 1.0
