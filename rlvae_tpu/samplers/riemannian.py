"""Riemannian posterior/prior sampling families.

Functional reimplementation of the reference's WorkingRiemannianSampler and
OfficialRHVAESampler surfaces (reference: src/models/riemannian_flow_vae.py:
62-434 posterior/prior methods, :728-777 official training sampling; the
extracted duplicate lives in src/models/samplers/riemannian_sampler.py).

Every method is a pure jit/vmap-safe function of (metric, key, ...).  The
reference's try/except Cholesky->eigh fallbacks become a deterministic
``+1e-6 I`` jitter (exceptions don't exist under jit); the eigh-based
symmetric square roots are kept where the reference uses them so the sampling
distributions match method-for-method.

Posterior methods ("sampling.method" in configs):
    standard  - plain reparameterization
    basic     - 0.1-scale Cholesky(G^{-1}(z_std)) metric noise mix   (:232-268)
    enhanced  - virtual top-2-centroid metric noise at 0.15 mix      (:90-152)
    geodesic  - centroid-pair geodesic + perpendicular G noise       (:154-230)
    official  - 0.1-scale Cholesky(G^{-1}(mu)) at hardcoded T=0.1    (:728-777)

Prior methods:
    geodesic / centroid_aware / weighted_mixture / basic             (:270-434)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from rlvae_tpu.geometry import metric as gm
from rlvae_tpu.geometry.metric import CentroidMetric
from rlvae_tpu.ops import linalg as _lin

Array = jax.Array

POSTERIOR_METHODS = (
    "standard", "basic", "enhanced", "geodesic", "official", "hmc"
)
PRIOR_METHODS = (
    "geodesic", "geodesic_exact", "centroid_aware", "weighted_mixture", "basic"
)


def _sym_sqrt(mat: Array, clamp: float = 1e-8) -> Array:
    """Symmetric PSD square root via eigh (the reference's fallback-style
    transform, used as the primary one in the prior samplers)."""
    vals, vecs = jnp.linalg.eigh(mat)
    vals = jnp.clip(vals, a_min=clamp)
    return jnp.einsum("bij,bj,bkj->bik", vecs, jnp.sqrt(vals), vecs)


def _std(log_var: Array) -> Array:
    return jnp.exp(0.5 * log_var)


def reparam(key: Array, mu: Array, log_var: Array) -> Array:
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    return mu + eps * _std(log_var)


# ---------------------------------------------------------------------------
# Posterior sampling
# ---------------------------------------------------------------------------


def sample_posterior(
    metric: Optional[CentroidMetric],
    key: Array,
    mu: Array,
    log_var: Array,
    method: str = "enhanced",
) -> Array:
    """Dispatch on the (static) sampling method."""
    if metric is None or method == "standard":
        return reparam(key, mu, log_var)
    if method == "basic":
        return _posterior_basic(metric, key, mu, log_var)
    if method == "enhanced":
        return _posterior_enhanced(metric, key, mu, log_var)
    if method == "geodesic":
        return _posterior_geodesic(metric, key, mu, log_var)
    if method == "official":
        return _posterior_official(metric, key, mu, log_var)
    if method == "hmc":
        # posterior-tempered HMC refinement (reference:
        # hmc_sampler.py:216-257 sample_riemannian_latents)
        from rlvae_tpu.samplers.hmc import sample_posterior_hmc

        return sample_posterior_hmc(metric, key, mu, log_var)
    raise ValueError(f"Unknown posterior sampling method: {method}")


def _posterior_basic(metric, key, mu, log_var):
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    z_std = mu + eps * _std(log_var)
    l = gm.chol_g_inv(metric, z_std, jitter=1e-6)
    eps_t = jnp.einsum("bij,bj->bi", l, eps)
    scale = 0.1
    return mu + eps_t * _std(log_var) * scale + eps * _std(log_var) * (1.0 - scale)


def _top2_centroids(metric, mu):
    dist = jnp.linalg.norm(mu[:, None, :] - metric.centroids[None, :, :], axis=-1)
    if metric.n_centroids < 2:
        # degenerate single-centroid metric: both 'nearest' slots point at
        # it (top_k would fail at trace time for k > n)
        idx = jnp.zeros((mu.shape[0], 2), jnp.int32)
        return jnp.repeat(dist, 2, axis=1), idx
    neg_top, idx = jax.lax.top_k(-dist, 2)  # two nearest
    return -neg_top, idx  # distances [B, 2], indices [B, 2]


def _posterior_enhanced(metric, key, mu, log_var):
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    d2, idx = _top2_centroids(metric, mu)
    w = 1.0 / (d2 + 1e-8)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    c1 = metric.centroids[idx[:, 0]]
    c2 = metric.centroids[idx[:, 1]]
    virtual = w[:, 0:1] * c1 + w[:, 1:2] * c2
    l = gm.chol_g_inv(metric, virtual, jitter=1e-6)
    eps_t = jnp.einsum("bij,bj->bi", l, eps)
    influence = 0.15
    return mu + eps_t * _std(log_var) * influence + eps * _std(log_var) * (1.0 - influence)


def _posterior_geodesic(metric, key, mu, log_var):
    k_eps, k_t = jax.random.split(key)
    eps = jax.random.normal(k_eps, mu.shape, mu.dtype)
    _, idx = _top2_centroids(metric, mu)
    c1 = metric.centroids[idx[:, 0]]
    c2 = metric.centroids[idx[:, 1]]
    t = jax.random.uniform(k_t, (mu.shape[0], 1), mu.dtype)
    z_geo = (1.0 - t) * c1 + t * c2
    direction = c2 - c1
    direction = direction / (jnp.linalg.norm(direction, axis=-1, keepdims=True) + 1e-8)
    mu_to_geo = mu - z_geo
    parallel = jnp.sum(mu_to_geo * direction, axis=-1, keepdims=True) * direction
    g_geo = gm.g(metric, z_geo)
    l = _lin.cholesky_small(g_geo, jitter=1e-6)
    eps_perp = jnp.einsum("bij,bj->bi", l, eps)
    scale = 0.3
    return (
        z_geo
        + scale * eps_perp * _std(log_var)
        + (1.0 - scale) * (mu - z_geo)
        + 0.1 * parallel
    )


def _posterior_official(metric, key, mu, log_var):
    """Official RHVAE-style training sampling: Cholesky of G^{-1}(mu) at the
    pythae-hardcoded temperature T=0.1, 0.1 noise scale
    (reference: riemannian_flow_vae.py:700-770)."""
    official = metric.replace(temperature=jnp.asarray(0.1, jnp.float32))
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    l = gm.chol_g_inv(official, mu, jitter=1e-6)
    eps_t = jnp.einsum("bij,bj->bi", l, eps)
    return mu + eps_t * _std(log_var) * 0.1


def sample_metric_aware_posterior(
    metric: CentroidMetric, key: Array, mu: Array, log_var: Array
) -> Array:
    """The 'riemannian_metric' posterior: z0 = mu + chol(G^{-1}(mu)) eps.

    Approximates q(z0|x0) ~ det G(z0)^{-1/2} exp(-0.5 (z0-mu)^T G(z0) (z0-mu))
    by freezing G at mu (reference: riemannian_flow_vae.py:953-1002).  The
    reference inverts G(mu) back to G^{-1}(mu) with a 1e-6 jitter; evaluating
    G^{-1}(mu) directly is the same quantity without the double inversion.
    """
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    l = gm.chol_g_inv(metric, mu, jitter=1e-6)
    return mu + jnp.einsum("bij,bj->bi", l, eps)


# ---------------------------------------------------------------------------
# Prior sampling
# ---------------------------------------------------------------------------


def sample_prior(
    metric: Optional[CentroidMetric],
    key: Array,
    num_samples: int,
    latent_dim: int,
    method: str = "geodesic",
) -> Array:
    if metric is None:
        return jax.random.normal(key, (num_samples, latent_dim))
    if method == "geodesic":
        return _prior_geodesic(metric, key, num_samples)
    if method == "geodesic_exact":
        return _prior_geodesic_exact(metric, key, num_samples)
    if method == "centroid_aware":
        return _prior_centroid_aware(metric, key, num_samples)
    if method == "weighted_mixture":
        return _prior_weighted_mixture(metric, key, num_samples)
    if method == "basic":
        return _prior_basic(metric, key, num_samples)
    raise ValueError(f"Unknown prior sampling method: {method}")


def _prior_geodesic(metric, key, n):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    kc = metric.n_centroids
    i1 = jax.random.randint(k1, (n,), 0, kc)
    i2 = jax.random.randint(k2, (n,), 0, kc)
    start, end = metric.centroids[i1], metric.centroids[i2]
    t = jax.random.uniform(k3, (n, 1))
    z_path = (1.0 - t) * start + t * end
    direction = end - start
    direction = direction / (jnp.linalg.norm(direction, axis=-1, keepdims=True) + 1e-8)
    eps = jax.random.normal(k4, (n, metric.latent_dim))
    parallel = jnp.sum(eps * direction, axis=-1, keepdims=True) * direction
    perp = eps - parallel
    sqrt_gi = _sym_sqrt(gm.g_inv(metric, z_path))
    eps_metric = jnp.einsum("bij,bj->bi", sqrt_gi, perp)
    return z_path + 0.2 * eps_metric


def _prior_geodesic_exact(metric, key, n, n_points=12, n_iters=80):
    """The 'geodesic' prior with the interpolation point taken on the TRUE
    energy-minimized geodesic between the centroid pair instead of the
    straight line (beyond-reference upgrade; the noise recipe — metric
    noise perpendicular to the local path tangent at scale 0.2 — matches
    the reference's geodesic prior, riemannian_flow_vae.py:270-318)."""
    from rlvae_tpu.geometry.geodesics import energy_path

    k1, k2, k3, k4 = jax.random.split(key, 4)
    kc = metric.n_centroids
    i1 = jax.random.randint(k1, (n,), 0, kc)
    i2 = jax.random.randint(k2, (n,), 0, kc)
    start, end = metric.centroids[i1], metric.centroids[i2]
    paths = energy_path(metric, start, end, n_points=n_points, n_iters=n_iters)
    # continuous parameter t -> linear blend inside the discrete segment
    s = jax.random.uniform(k3, (n,)) * (n_points - 1)
    lo = jnp.clip(jnp.floor(s).astype(jnp.int32), 0, n_points - 2)
    frac = (s - lo)[:, None]
    rows = jnp.arange(n)
    z_lo, z_hi = paths[rows, lo], paths[rows, lo + 1]
    z_path = (1.0 - frac) * z_lo + frac * z_hi
    tangent = z_hi - z_lo
    tangent = tangent / (jnp.linalg.norm(tangent, axis=-1, keepdims=True) + 1e-8)
    eps = jax.random.normal(k4, (n, metric.latent_dim))
    parallel = jnp.sum(eps * tangent, axis=-1, keepdims=True) * tangent
    perp = eps - parallel
    sqrt_gi = _sym_sqrt(gm.g_inv(metric, z_path))
    eps_metric = jnp.einsum("bij,bj->bi", sqrt_gi, perp)
    return z_path + 0.2 * eps_metric


def _prior_centroid_aware(metric, key, n):
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (n,), 0, metric.n_centroids)
    base = metric.centroids[idx]
    eps = jax.random.normal(k2, (n, metric.latent_dim)) * 0.3
    sqrt_gi = _sym_sqrt(gm.g_inv(metric, base))
    eps_metric = jnp.einsum("bij,bj->bi", sqrt_gi, eps)
    return base + 0.5 * eps_metric


def _prior_weighted_mixture(metric, key, n):
    k1, k2 = jax.random.split(key)
    norms = jnp.linalg.norm(metric.centroids, axis=-1)
    logits = -norms / 2.0  # w ~ exp(-|c|/2), categorical == softmax(logits)
    idx = jax.random.categorical(k1, logits, shape=(n,))
    sel = metric.centroids[idx]
    eps = jax.random.normal(k2, (n, metric.latent_dim))
    l = gm.chol_g_inv(metric, sel, jitter=1e-6)
    eps_metric = jnp.einsum("bij,bj->bi", l, eps)
    det_gi = jnp.exp(gm.logdet_g_inv(metric, sel))
    local_scale = det_gi ** (1.0 / (2.0 * metric.latent_dim))
    adaptive = jnp.clip(0.4 / (local_scale + 1e-6), 0.1, 1.0)
    return sel + eps_metric * adaptive[:, None]


def _prior_basic(metric, key, n):
    """10-step gradient ascent on 0.5 log det G^{-1} - 0.5 |z|^2 with a
    decaying step (reference: riemannian_flow_vae.py:407-434)."""
    z0 = jax.random.normal(key, (n, metric.latent_dim)) * 0.5
    steps = 10

    def log_prob(z):
        ld = jnp.maximum(gm.logdet_g_inv(metric, z), jnp.log(1e-10))
        return jnp.sum(0.5 * ld - 0.5 * jnp.linalg.norm(z, axis=1) ** 2)

    grad_fn = jax.grad(log_prob)

    def body(step, z):
        step_size = 0.01 * (1.0 - step / steps)
        return z + step_size * grad_fn(z)

    return jax.lax.fori_loop(0, steps, body, z0)
