"""Centroid-sharded metric evaluation — expert-parallel-style scaling axis.

The metric is a K-way reduction (reference:
src/models/components/metric_tensor.py:120-134; pythae rhvae_utils.py:4-41):

    G^{-1}(z) = sum_k M_k * exp(-||z - c_k||^2 / T^2) + lbd * I

In RHVAE the centroid bank IS the metric-training subset (pythae
rhvae_model.py stores one centroid per retained training observation), so K —
not the batch — is the axis that grows with dataset scale.  The reference
evaluates the full bank on one GPU; this module shards the bank over a mesh
axis the TPU-native way:

- each device holds a [K/s, D] / [K/s, D, D] slice of the centroids/matrices,
- computes its partial weighted sum as a local MXU matmul ([B, K/s] @
  [K/s, D*D], same layout as the dense path in geometry/metric.py),
- ONE ``psum`` of the [B, D, D] partial over ICI completes G^{-1},
- all nonlinear work (Cholesky, log-det, inverse, the HMC gradient
  contraction) happens after the reduction, on the device's batch shard only.

Communication amortization: per-device FLOPs scale as B * (K/s) * (D + D^2)
while the psum payload is a fixed B * D^2 * 4 bytes — arithmetic intensity
grows linearly in K/s, so the collective is cheap exactly in the regime where
sharding is needed (large K).  Combined with the batch axis this gives a 2-D
(data x model) decomposition: z sharded over ``data``, the bank over
``model``, with the psum riding the model axis only.

Padding: K is padded to a multiple of the shard count with zero matrices and
far-away centroids — padded entries contribute w_k * 0 = 0 to every output,
including the HMC gradient (which multiplies through M_k).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rlvae_tpu.geometry.metric import CentroidMetric
from rlvae_tpu.ops import linalg as _lin
from rlvae_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

Array = jax.Array


def pad_metric(metric: CentroidMetric, shards: int) -> CentroidMetric:
    """Pad the centroid bank so K divides ``shards`` (static shapes for jit).

    Padded rows have zero matrices (no contribution to any weighted sum) and
    centroids displaced far from the data so their weights underflow to 0.0
    as well — keeping even weight-sum diagnostics exact.
    """
    k = metric.n_centroids
    k_pad = ((k + shards - 1) // shards) * shards
    if k_pad == k:
        return metric
    extra = k_pad - k
    d = metric.latent_dim
    far = jnp.full((extra, d), 1e6, dtype=jnp.float32)
    return CentroidMetric(
        centroids=jnp.concatenate([metric.centroids.astype(jnp.float32), far]),
        matrices=jnp.concatenate(
            [metric.matrices.astype(jnp.float32), jnp.zeros((extra, d, d), jnp.float32)]
        ),
        temperature=metric.temperature,
        regularization=metric.regularization,
        latent_dim=d,
    )


def _put(mesh: Mesh, value, spec: P) -> Array:
    """Place a host-replicated value under ``spec`` on any process count:
    ``make_array_from_callback`` hands each addressable device its slice, so
    the same placement works single-process and on a real multi-host cluster
    (every process holds the full bank — it is model state, not data)."""
    import numpy as np

    value = np.asarray(value)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(value.shape, sharding, lambda idx: value[idx])


def shard_metric(
    mesh: Mesh, metric: CentroidMetric, axis: str = MODEL_AXIS
) -> CentroidMetric:
    """Pad and place the bank with K sharded over ``axis`` (replicated over
    every other mesh axis).  Valid on any ``jax.process_count()``."""
    padded = pad_metric(metric, int(mesh.shape[axis]))
    return CentroidMetric(
        centroids=_put(mesh, padded.centroids, P(axis, None)),
        matrices=_put(mesh, padded.matrices, P(axis, None, None)),
        temperature=_put(mesh, padded.temperature, P()),
        regularization=_put(mesh, padded.regularization, P()),
        latent_dim=padded.latent_dim,
    )


def _partial_terms(c, m, t, lbd, z, backend: str = "auto"):
    """One shard's (G^{-1} partial WITHOUT + lbd I, scaled gradient
    contraction v = (-2/T^2) sum_k w_k M_k^T (c_k - z)) — the K-proportional
    piece of the HMC terms.  Routed through the fused Pallas kernel on TPU
    (ops.metric_kernels.hmc_partials_pallas; interpret-mode elsewhere when
    forced), XLA otherwise.  Both the partial sum and the scaling commute
    with the cross-shard psum."""
    if backend not in ("auto", "pallas", "xla"):
        # an unrecognized string silently measuring the XLA arm is exactly
        # the silent-same-arm A/B failure documented in CLAUDE.md
        raise ValueError(f"backend must be auto|pallas|xla, got {backend!r}")
    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from rlvae_tpu.ops.metric_kernels import hmc_partials_pallas

        local = CentroidMetric(
            centroids=c, matrices=m, temperature=t, regularization=lbd,
            latent_dim=int(c.shape[1]),
        )
        return hmc_partials_pallas(local, z.astype(jnp.float32))
    z = z.astype(jnp.float32)
    inv_t2 = 1.0 / (t * t)
    w, gi_part = _partial_g_inv(c, m, inv_t2, z)
    diff = c[None, :, :] - z[:, None, :]
    v_part = jnp.einsum(
        "bk,bki,kij->bj", w, diff, m,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return gi_part, (-2.0 * inv_t2) * v_part


def _partial_g_inv(c: Array, m: Array, inv_t2: Array, z: Array):
    """One shard's (weights [B, K/s], partial weighted sum [B, D, D] WITHOUT
    the + lbd I term) — same MXU layout as the dense path."""
    z = z.astype(jnp.float32)
    diff = z[:, None, :] - c[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    w = jnp.exp(-d2 * inv_t2)  # [B, K/s]
    k, d = c.shape
    gi_part = jax.lax.dot_general(
        w,
        m.reshape(k, d * d),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(z.shape[0], d, d)
    return w, gi_part


def _run_sharded(
    mesh: Mesh, fn, out_trailing_ndims: Tuple[int, ...], axis: str,
    batch_axis: Optional[str],
):
    """shard_map a (c, m, t, lbd, z, axis) -> tuple function: bank leaves
    sharded along K over ``axis``, z and each output's leading dim over
    ``batch_axis`` (or replicated).  ``out_trailing_ndims`` gives each
    output's number of trailing (non-batch, locally-replicated) dims."""
    from jax.experimental.shard_map import shard_map

    z_spec = P(batch_axis) if batch_axis else P()
    # every output carries the batch as its leading dim; trailing dims local
    out_specs = tuple(
        (P(batch_axis, *([None] * nd)) if batch_axis else P()) for nd in out_trailing_ndims
    )

    def run(metric: CentroidMetric, z: Array):
        return shard_map(
            lambda c, m, t, lbd, zz: fn(c, m, t, lbd, zz, axis),
            mesh=mesh,
            in_specs=(P(axis, None), P(axis, None, None), P(), P(), z_spec),
            out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
            check_rep=False,
        )(metric.centroids, metric.matrices, metric.temperature, metric.regularization, z)

    return run


def g_inv_sharded(
    mesh: Mesh,
    metric: CentroidMetric,
    z: Array,
    axis: str = MODEL_AXIS,
    batch_axis: Optional[str] = DATA_AXIS,
) -> Array:
    """G^{-1}(z) with the centroid bank sharded over ``axis`` and the batch
    over ``batch_axis``.  ``metric`` must come from :func:`shard_metric` (or
    at least have K divisible by the axis size)."""

    def fn(c, m, t, lbd, zz, ax):
        _, gi_part = _partial_g_inv(c, m, 1.0 / (t * t), zz)
        gi = jax.lax.psum(gi_part, ax)
        return gi + lbd * jnp.eye(gi.shape[-1], dtype=jnp.float32)

    return _run_sharded(mesh, fn, (2,), axis, batch_axis)(metric, z)


def chol_g_inv_sharded(
    mesh: Mesh,
    metric: CentroidMetric,
    z: Array,
    jitter: float = 1e-6,
    axis: str = MODEL_AXIS,
    batch_axis: Optional[str] = DATA_AXIS,
) -> Array:
    """L with L L^T = G^{-1}(z) + jitter*I; the Cholesky runs post-psum on
    each device's batch shard (unrolled small-matrix routine, no LAPACK)."""

    def fn(c, m, t, lbd, zz, ax):
        _, gi_part = _partial_g_inv(c, m, 1.0 / (t * t), zz)
        gi = jax.lax.psum(gi_part, ax)
        gi = gi + lbd * jnp.eye(gi.shape[-1], dtype=jnp.float32)
        return _lin.cholesky_small(gi, jitter=jitter)

    return _run_sharded(mesh, fn, (2,), axis, batch_axis)(metric, z)


def _finish_hmc_terms(gi_part: Array, v: Array, lbd, eps: float):
    """Post-psum tail of the HMC terms: + lbd I, Cholesky, guarded log
    target, G, and the final G^T v product — all local to the batch shard."""
    gi = gi_part + lbd * jnp.eye(gi_part.shape[-1], dtype=jnp.float32)
    l = _lin.cholesky_small(gi, jitter=0.0)
    half_ld = 0.5 * _lin.logdet_from_chol(l)
    if eps == 0.0:
        logpi = half_ld
    else:
        logpi = jnp.logaddexp(half_ld, jnp.log(jnp.float32(eps)))
    gz = _lin.inv_psd_small(gi, jitter=0.0)
    grad = -0.5 * jnp.einsum(
        "bji,bj->bi", gz, v,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return logpi, grad


def hmc_terms_sharded(
    mesh: Mesh,
    metric: CentroidMetric,
    z: Array,
    eps: float = 1e-10,
    axis: str = MODEL_AXIS,
    batch_axis: Optional[str] = DATA_AXIS,
    backend: str = "auto",
):
    """(log pi(z), grad log pi(z)) for the manifold HMC target, centroid-
    sharded.  Matches pythae's guarded target and closed-form gradient
    (reference: pythae rhvae_sampler.py:158-187; see
    geometry.metric.grad_log_sqrt_det_g_inv for the math note): the two
    partial reductions (G^{-1} and the M_k^T (c_k - z) contraction) ride one
    fused psum; G, the Cholesky, and the final G^T v product stay local.
    ``backend`` routes the K-proportional partials through the fused Pallas
    kernel ('auto' picks it on TPU).
    """

    def fn(c, m, t, lbd, zz, ax):
        gi_part, v_part = _partial_terms(c, m, t, lbd, zz, backend)
        gi_part, v_part = jax.lax.psum((gi_part, v_part), ax)
        return _finish_hmc_terms(gi_part, v_part, lbd, eps)

    return _run_sharded(mesh, fn, (0, 1), axis, batch_axis)(metric, z)


def sample_prior_hmc_sharded(
    mesh: Mesh,
    metric: CentroidMetric,
    key: Array,
    num_samples: int,
    config=None,
    axis: str = MODEL_AXIS,
    batch_axis: str = DATA_AXIS,
    return_diagnostics: bool = False,
    backend: str = "auto",
):
    """Distributed manifold-HMC generation: chains sharded over
    ``batch_axis``, the centroid bank over ``axis``.

    Runs the SAME integrator as samplers.hmc.sample_prior_hmc (bit-identical
    noise via the factored-out draw_chain_noise) inside ``shard_map``, with
    the per-leapfrog-step (log pi, grad) terms computed from local bank
    partials + one fused psum — so a 1500-evaluation chain over a
    dataset-sized bank runs with per-device bank memory K/s and a fixed
    [B/dp, D, D]-payload collective per evaluation, all inside one compiled
    scan (no host round trips).  Reference chain semantics: pythae
    rhvae_sampler.py:98-148.

    ``metric`` is the UNPADDED bank (inits index the real centroids); padding
    and placement happen here.  ``num_samples`` must divide the batch axis.
    """
    from jax.experimental.shard_map import shard_map

    from rlvae_tpu.samplers.hmc import HMCConfig, draw_chain_noise, run_prior_chain

    config = config or HMCConfig()
    d = metric.latent_dim
    dp = int(mesh.shape[batch_axis])
    if num_samples % dp != 0:
        raise ValueError(f"num_samples={num_samples} must divide the '{batch_axis}' axis ({dp})")

    # inits + noise drawn exactly like the dense sampler (same key derivation)
    k_init, k_chain = jax.random.split(key)
    if config.init == "centroids":
        idx = jax.random.randint(k_init, (num_samples,), 0, metric.n_centroids)
        z0 = metric.centroids[idx]
    else:
        z0 = jax.random.normal(k_init, (num_samples, d))
    gammas, unifs = draw_chain_noise(k_chain, config.mcmc_steps, num_samples, d)

    bank = shard_metric(mesh, metric, axis)
    # global placement of inits + noise: every process computes the identical
    # values (pure functions of the key), the callback hands each device its
    # slice — valid on any process count
    z0 = _put(mesh, z0, P(batch_axis, None))
    gammas = _put(mesh, gammas, P(None, batch_axis, None))
    unifs = _put(mesh, unifs, P(None, batch_axis))

    def local_chain(c, m, t, lbd, z0_l, gammas_l, unifs_l):
        def terms(zz):
            gi_part, v_part = _partial_terms(c, m, t, lbd, zz, backend)
            gi_part, v_part = jax.lax.psum((gi_part, v_part), axis)
            return _finish_hmc_terms(gi_part, v_part, lbd, eps=1e-10)

        # global accept rate: local mean then pmean over the chain shards
        mean_fn = lambda a: jax.lax.pmean(jnp.mean(a), batch_axis)
        return run_prior_chain(terms, z0_l, gammas_l, unifs_l, config, mean_fn=mean_fn)

    z, accept_rate, logpi_final = shard_map(
        local_chain,
        mesh=mesh,
        in_specs=(
            P(axis, None),
            P(axis, None, None),
            P(),
            P(),
            P(batch_axis, None),
            P(None, batch_axis, None),
            P(None, batch_axis),
        ),
        out_specs=(P(batch_axis, None), P(), P(batch_axis)),
        check_rep=False,
    )(bank.centroids, bank.matrices, bank.temperature, bank.regularization,
      z0, gammas, unifs)
    if return_diagnostics:
        return z, {"accept_rate": accept_rate, "log_pi": logpi_final}
    return z
