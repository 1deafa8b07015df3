"""Centroid-based Riemannian metric — the framework's north-star computation.

Implements the metric family of the reference (reference:
src/models/components/metric_tensor.py:98-207 and
src/lib/src/pythae/models/rhvae/rhvae_utils.py:4-41):

    G^{-1}(z) = sum_k M_k * exp(-||z - c_k||^2 / T^2) + lbd * I
    G(z)      = [G^{-1}(z)]^{-1}

with centroids ``c_k`` [K, D], SPD matrices ``M_k`` [K, D, D], temperature
``T`` and regularization ``lbd``.

TPU-first design decisions (vs. the reference's [B, K, D, D] broadcast-sum):

- The weighted sum of metric matrices is a single [B, K] @ [K, D*D] matmul on
  the MXU — no [B, K, D, D] intermediate ever materializes in HBM.
- The squared distances are computed as ||z||^2 - 2 z c^T + ||c||^2 (another
  MXU matmul) in fp32.
- Inversion / log-det / Cholesky use the unrolled small-matrix routines in
  :mod:`rlvae_tpu.ops.linalg` instead of general LAPACK-style paths.
- Failure handling is branchless: a deterministic ``jitter * I`` is always
  added before factorization (the reference's try/except Cholesky->eigh
  fallbacks, e.g. riemannian_flow_vae.py:986-995, cannot exist under jit).

All functions are jit/vmap/grad-safe pure functions of a ``CentroidMetric``
pytree, so the metric parameters can themselves be trained.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from rlvae_tpu.ops import linalg as _lin

Array = jax.Array


@struct.dataclass
class CentroidMetric:
    """Parameters of the centroid metric, registered as a JAX pytree."""

    centroids: Array  # [K, D]
    matrices: Array  # [K, D, D] (SPD)
    temperature: Array  # scalar
    regularization: Array  # scalar (lbd)

    # static metadata
    latent_dim: int = struct.field(pytree_node=False, default=16)

    @classmethod
    def create(
        cls,
        centroids,
        matrices,
        temperature: float = 0.1,
        regularization: float = 0.01,
    ) -> "CentroidMetric":
        centroids = jnp.asarray(centroids, jnp.float32)
        matrices = jnp.asarray(matrices, jnp.float32)
        if centroids.ndim != 2 or matrices.shape != (*centroids.shape, centroids.shape[1]):
            raise ValueError(
                f"Inconsistent metric shapes: centroids {centroids.shape}, "
                f"matrices {matrices.shape}"
            )
        return cls(
            centroids=centroids,
            matrices=matrices,
            temperature=jnp.asarray(temperature, jnp.float32),
            regularization=jnp.asarray(regularization, jnp.float32),
            latent_dim=int(centroids.shape[1]),
        )

    @classmethod
    def identity(cls, latent_dim: int, n_centroids: int = 1, temperature: float = 0.1,
                 regularization: float = 0.01, key: Optional[Array] = None) -> "CentroidMetric":
        """Identity metric matrices at random (or zero) centroids."""
        if key is None:
            centroids = jnp.zeros((n_centroids, latent_dim), jnp.float32)
        else:
            centroids = jax.random.normal(key, (n_centroids, latent_dim), jnp.float32)
        matrices = jnp.broadcast_to(
            jnp.eye(latent_dim, dtype=jnp.float32), (n_centroids, latent_dim, latent_dim)
        )
        return cls.create(centroids, matrices, temperature, regularization)

    @property
    def n_centroids(self) -> int:
        return self.centroids.shape[0]

    # Convenience method views over the functional API ----------------------
    def weights(self, z: Array) -> Array:
        return weights(self, z)

    def g_inv(self, z: Array) -> Array:
        return g_inv(self, z)

    def g(self, z: Array) -> Array:
        return g(self, z)

    def chol_g_inv(self, z: Array, jitter: float = 1e-6) -> Array:
        return chol_g_inv(self, z, jitter)

    def logdet_g(self, z: Array) -> Array:
        return logdet_g(self, z)

    def log_sqrt_det_g_inv(self, z: Array) -> Array:
        return log_sqrt_det_g_inv(self, z)

    def grad_log_sqrt_det_g_inv(self, z: Array) -> Array:
        return grad_log_sqrt_det_g_inv(self, z)

    def dist2(self, z1: Array, z2: Array) -> Array:
        return dist2(self, z1, z2)

    def diagnostics(self, z: Array) -> Dict[str, Any]:
        return diagnostics(self, z)


def weights(metric: CentroidMetric, z: Array) -> Array:
    """Centroid weights w_k(z) = exp(-||z - c_k||^2 / T^2), shape [B, K].

    The exponent is scaled by 1/T^2 (T^2 = 0.01 for the main pretrained
    metric), so the squared distances are precision-critical: they are
    computed directly as sum((z-c)^2) in full fp32 on the VPU — the expanded
    quadratic form would ride the MXU but loses ~3 decimal digits to bf16
    input truncation on TPU, which the exp() then amplifies 100x.
    """
    z = z.astype(jnp.float32)
    diff = z[:, None, :] - metric.centroids[None, :, :]  # [B, K, D]
    d2 = jnp.sum(diff * diff, axis=-1)  # [B, K]
    return jnp.exp(-d2 / (metric.temperature**2))


def g_inv(metric: CentroidMetric, z: Array) -> Array:
    """Inverse metric G^{-1}(z), shape [B, D, D].

    One [B, K] @ [K, D*D] matmul instead of the reference's
    [B, K, D, D] broadcast-multiply-sum (metric_tensor.py:120-134).
    """
    b = z.shape[0]
    k, d = metric.centroids.shape
    w = weights(metric, z)  # [B, K]
    m_flat = metric.matrices.reshape(k, d * d)
    # HIGHEST precision: full-fp32 MXU passes. The default (bf16 inputs) costs
    # ~0.4% relative error, far above the 1e-5 parity gate; the matmul is tiny
    # (K x D^2) so the 6-pass cost is irrelevant.
    gi = jax.lax.dot_general(
        w,
        m_flat,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(b, d, d)
    return gi + metric.regularization * jnp.eye(d, dtype=jnp.float32)


def _chol_g_inv_xla(metric: CentroidMetric, z: Array, jitter: float = 1e-6) -> Array:
    """Reference XLA path (also the backward of the fused kernel)."""
    return _lin.cholesky_small(g_inv(metric, z), jitter=jitter)


def chol_g_inv(metric: CentroidMetric, z: Array, jitter: float = 1e-6) -> Array:
    """L with L L^T = G^{-1}(z) + jitter*I (branchless; no try/except).

    On TPU the forward runs the fused Pallas bundle (one kernel for the
    whole weights->G^{-1}->chol chain) with gradients recomputed through
    this XLA path — putting the north-star kernel on the training hot path
    (metric-aware posterior + Riemannian KL)."""
    if jax.default_backend() == "tpu" and z.ndim == 2:
        from rlvae_tpu.ops.metric_kernels import chol_g_inv_fused, fused_supported

        if fused_supported(metric):
            return chol_g_inv_fused(metric, z, jitter)
    return _chol_g_inv_xla(metric, z, jitter)


def _g_xla(metric: CentroidMetric, z: Array, jitter: float = 0.0) -> Array:
    return _lin.inv_psd_small(g_inv(metric, z), jitter=jitter)


def g(metric: CentroidMetric, z: Array, jitter: float = 0.0) -> Array:
    """Metric tensor G(z) = [G^{-1}(z)]^{-1} via unrolled Cholesky solves
    (fused Pallas forward on TPU, see chol_g_inv)."""
    if jitter == 0.0 and jax.default_backend() == "tpu" and z.ndim == 2:
        from rlvae_tpu.ops.metric_kernels import fused_supported, g_fused

        if fused_supported(metric):
            return g_fused(metric, z)
    return _g_xla(metric, z, jitter)


def chol_g(metric: CentroidMetric, z: Array, jitter: float = 1e-6) -> Array:
    """L with L L^T = G(z) + jitter*I."""
    return _lin.cholesky_small(g(metric, z), jitter=jitter)


def logdet_g_inv(metric: CentroidMetric, z: Array) -> Array:
    """log det G^{-1}(z), shape [B]."""
    return _lin.logdet_from_chol(chol_g_inv(metric, z, jitter=0.0))


def logdet_g(metric: CentroidMetric, z: Array) -> Array:
    """log det G(z) = -log det G^{-1}(z) (reference: metric_tensor.py:162-182)."""
    return -logdet_g_inv(metric, z)


def log_sqrt_det_g_inv(metric: CentroidMetric, z: Array, eps: float = 1e-10) -> Array:
    """log(sqrt(det G^{-1}(z)) + eps) — the HMC target log-density.

    The eps guard reproduces pythae exactly (reference: pythae
    rhvae_sampler.py:158: ``log(sqrt(det(G_inv)) + 1e-10)``).  It is not
    cosmetic: for the main pretrained metric, det G^{-1} ~ lbd^D ~ 1e-32 away
    from the centroids, so the reference's target density plateaus at
    log(1e-10) there — behavior the HMC chain depends on.  Computed
    branchlessly as logaddexp(0.5 logdet, log(eps)); pass ``eps=0`` for the
    pure log-density.
    """
    half_ld = 0.5 * logdet_g_inv(metric, z)
    if eps == 0.0:
        return half_ld
    return jnp.logaddexp(half_ld, jnp.log(jnp.float32(eps)))


def grad_log_sqrt_det_g_inv(
    metric: CentroidMetric, z: Array, g_matrix: Optional[Array] = None
) -> Array:
    """Analytic gradient of log sqrt(det G^{-1}(z)), shape [B, D].

    Matches pythae's closed form exactly (reference: pythae
    rhvae_sampler.py:163-187):

        grad = -0.5 * G(z)^T @ [ sum_k (-2/T^2) * w_k * M_k^T (c_k - z) ]

    NB: this closed form is what pythae ships and what the reference's HMC
    integrates with, but it is *not* the exact gradient of log sqrt det G^{-1}
    (the exact form has tr(G M_k) (c_k - z) in place of G M_k^T (c_k - z)).
    We reproduce the reference behavior here; use
    ``jax.grad(log_sqrt_det_g_inv)`` when the exact gradient is wanted.

    The inner sum is evaluated without materializing [B, K, D, D]:
    v_j = sum_k w_k sum_i (c_k - z)_i M_k[i, j]
        = einsum('bk,bki,kij->bj', w, c - z, M)
    (i.e. M_k^T applied to the diff — the index string below is the code's
    single source of truth).
    """
    z = z.astype(jnp.float32)
    w = weights(metric, z)  # [B, K]
    diff = metric.centroids[None, :, :] - z[:, None, :]  # [B, K, D]
    # v[b, j] = sum_k w[b,k] * sum_i diff[b,k,i] * M[k,i,j]
    v = jnp.einsum(
        "bk,bki,kij->bj", w, diff, metric.matrices, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    v = (-2.0 / metric.temperature**2) * v
    gz = g(metric, z) if g_matrix is None else g_matrix
    # grad[b, :] = -0.5 * G^T v   (G symmetric in exact arithmetic; keep the
    # transpose to match the reference bit-for-bit in its asymmetric rounding)
    return -0.5 * jnp.einsum(
        "bji,bj->bi", gz, v, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )


def dist2(metric: CentroidMetric, z1: Array, z2: Array) -> Array:
    """Local squared Riemannian distance d^2 ~= (z1-z2)^T G(mid) (z1-z2)
    (reference: metric_tensor.py:184-207)."""
    mid = 0.5 * (z1 + z2)
    gm = g(metric, mid)
    diff = (z1 - z2).astype(jnp.float32)
    return jnp.einsum("bi,bij,bj->b", diff, gm, diff, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)


def quadratic_form(g_matrix: Array, diff: Array) -> Array:
    """diff^T G diff for batched G [B, D, D], diff [B, D] -> [B]."""
    return jnp.einsum(
        "bi,bij,bj->b",
        diff.astype(jnp.float32),
        g_matrix,
        diff.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def diagnostics(metric: CentroidMetric, z: Array) -> Dict[str, Any]:
    """Metric-geometry diagnostics (reference: metric_tensor.py:209-261).

    Not jit-safe end-to-end (returns Python floats); call outside jit.
    """
    gz = g(metric, z)
    giz = g_inv(metric, z)
    eig_g = jnp.linalg.eigvalsh(gz[0])
    eig_gi = jnp.linalg.eigvalsh(giz[0])
    # ONE device->host transfer for every scalar (per-scalar float() costs
    # ~ms each through the axon tunnel — CLAUDE.md)
    d = jax.device_get({
        "eigenvals_G_min": eig_g.min(),
        "eigenvals_G_max": eig_g.max(),
        "eigenvals_G_mean": eig_g.mean(),
        "eigenvals_G_inv_min": eig_gi.min(),
        "eigenvals_G_inv_max": eig_gi.max(),
        "eigenvals_G_inv_mean": eig_gi.mean(),
        "det_G_mean": jnp.exp(logdet_g(metric, z)).mean(),
        "det_G_inv_mean": jnp.exp(logdet_g_inv(metric, z)).mean(),
        "trace_G_mean": jnp.trace(gz, axis1=-2, axis2=-1).mean(),
        "trace_G_inv_mean": jnp.trace(giz, axis1=-2, axis2=-1).mean(),
        "temperature": metric.temperature,
        "regularization": metric.regularization,
    })
    out = {k: float(v) for k, v in d.items()}
    out["condition_number_G"] = out["eigenvals_G_max"] / (out["eigenvals_G_min"] + 1e-8)
    out["condition_number_G_inv"] = out["eigenvals_G_inv_max"] / (
        out["eigenvals_G_inv_min"] + 1e-8
    )
    out["batch_size"] = int(z.shape[0])
    out["n_centroids"] = metric.n_centroids
    return out
