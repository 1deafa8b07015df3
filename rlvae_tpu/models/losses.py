"""Loss library — stateless jnp functions.

Replaces the reference LossManager and the in-model loss blocks (reference:
src/models/components/loss_manager.py:44-260 and
src/models/riemannian_flow_vae.py:1192-1246,1004-1077,1328-1394).  History
tracking lives in the metrics logger, not here.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from rlvae_tpu.geometry import metric as gm
from rlvae_tpu.geometry.metric import CentroidMetric

Array = jax.Array

LOG_VAR_CLAMP = 10.0


def reconstruction_loss(recon: Array, x: Array, loop_mode: str = "open") -> Array:
    """Per-frame MSE summed over frames/pixels, mean over batch; closed-loop
    mode double-counts frame 0 (reference: riemannian_flow_vae.py:1192-1197).

    When the decoder emits bfloat16 reconstructions (the HBM-traffic knob,
    nets `out_dtype`), the residual and square stay in bf16 — so the
    backward's recon-sized cotangent is bf16 too, which is the whole point —
    and only the pixel-sum accumulates in fp32 (the sum over ~1e5 pixels is
    where bf16 would actually lose digits; the per-pixel residual rounding
    is ~0.4% relative, far below minibatch gradient noise)."""
    if recon.dtype == jnp.bfloat16:
        x = x.astype(jnp.bfloat16)
    frame_losses = (recon - x) ** 2  # [B, T, ...]
    if loop_mode == "closed":
        weights = jnp.ones(x.shape[1], frame_losses.dtype).at[0].set(2.0)
        frame_losses = frame_losses * weights.reshape(1, -1, *([1] * (x.ndim - 2)))
    return jnp.mean(
        jnp.sum(frame_losses.reshape(x.shape[0], -1), axis=1, dtype=jnp.float32)
    )


def standard_kl(mu: Array, log_var: Array) -> Array:
    lv = jnp.clip(log_var, -LOG_VAR_CLAMP, LOG_VAR_CLAMP)
    return jnp.mean(-0.5 * jnp.sum(1.0 + lv - mu**2 - jnp.exp(lv), axis=1))


def riemannian_metric_kl(metric: CentroidMetric, mu: Array, z: Array) -> Array:
    """KL for the metric-aware posterior against the uniform Riemannian prior:
    0.5 E[(z-mu)^T G(z) (z-mu)] — the log-det terms cancel
    (reference: riemannian_flow_vae.py:1004-1077).

    Evaluated as 0.5 ||L^{-1}(z) (z-mu)||^2 with L L^T = G^{-1}(z): one
    Cholesky + triangular solve instead of a full inverse.
    """
    from rlvae_tpu.ops import linalg as _lin

    l = gm.chol_g_inv(metric, z, jitter=0.0)
    u = _lin.tri_solve_lower(l, (z - mu).astype(jnp.float32))
    return 0.5 * jnp.mean(jnp.sum(u * u, axis=1))


def riemannian_full_kl(
    metric: CentroidMetric, mu: Array, log_var: Array, z: Array
) -> Array:
    """Full Gaussian-vs-Riemannian-prior KL (reference:
    riemannian_flow_vae.py:1328-1394):

        0.5 (tr(G diag(e^lv)) + mu^T G mu - D + log det G - sum lv)

    with det clamped to [1e-10, 1e10]; if ANY entry is non-finite the WHOLE
    batch falls back to the standard-KL mean — the reference's all-or-
    nothing isfinite guard (:1379-1385), reproduced branchlessly.
    """
    lv = jnp.clip(log_var, -LOG_VAR_CLAMP, LOG_VAR_CLAMP)
    g_z = gm.g(metric, z)
    # NB: the reference's trace term uses the UNCLAMPED log_var
    # (riemannian_flow_vae.py:1360); only the posterior log-det sum is
    # clamped (:1372) — torch-parity-tested (tests/test_model.py)
    trace_term = jnp.sum(
        jnp.diagonal(g_z, axis1=-2, axis2=-1) * jnp.exp(log_var), axis=1
    )
    quad = gm.quadratic_form(g_z, mu)
    log_det_g = jnp.log(jnp.clip(jnp.exp(gm.logdet_g(metric, z)), 1e-10, 1e10))
    d = mu.shape[1]
    kl_r = 0.5 * (trace_term + quad - d + log_det_g - jnp.sum(lv, axis=1))
    kl_std = -0.5 * jnp.sum(1.0 + lv - mu**2 - jnp.exp(lv), axis=1)
    return jnp.where(
        jnp.all(jnp.isfinite(kl_r)), jnp.mean(kl_r), jnp.mean(kl_std)
    )


def flow_loss(log_dets: Array, mode: str = "reference") -> Array:
    """Flow regularizer over per-transition log|det J| terms [B, T-1].

    ``"reference"``: -E[sum log|det J|] (reference:
    riemannian_flow_vae.py:1218-1219).  Minimizing this REWARDS expansion
    without bound: the optimum saturates every MADE block's log-sigma clamp
    at -1.5, scaling |z| by e^{1.5 * n_blocks} per transition — the proven
    source of the flagship's 1e10+ latent norms (both frameworks;
    outputs/curve_parity_flagship/, docs/ROADMAP.md).

    ``"volume"``: E[sum |log|det J||] — a volume-preservation penalty,
    zero iff every transition preserves latent volume and bounded below,
    so it cannot drive runaway expansion (beyond-reference stabilization;
    conf/model/riemannian_flow_vae_stable.yaml).
    """
    if mode not in ("reference", "volume"):
        # fail loudly: a silent fall-through to the unbounded reference loss
        # would reintroduce exactly the instability 'volume' exists to fix
        raise ValueError(f"unknown flow_loss mode {mode!r} (reference|volume)")
    if log_dets.shape[1] == 0:
        return jnp.zeros(())
    if mode == "volume":
        return jnp.mean(jnp.sum(jnp.abs(log_dets), axis=1))
    return -jnp.mean(jnp.sum(log_dets, axis=1))


def loop_penalty(z_last_raw: Array, z_first: Array) -> Array:
    """Mean-square cycle error (reference: riemannian_flow_vae.py:1221-1224)."""
    return jnp.mean((z_last_raw - z_first) ** 2)


def total_loss(
    recon: Array,
    kl: Array,
    flow: Array,
    loop: Array,
    kl_weight: float,
    loop_lambda: float,
) -> Array:
    return recon + kl_weight * kl + flow + loop_lambda * loop


def additional_metrics(
    x: Array,
    recon: Array,
    z_seq: Array,
    metric: Optional[CentroidMetric] = None,
) -> Dict[str, Array]:
    """Analysis metrics (reference: modular_rlvae.py:412-458): cyclicity error,
    latent norm/variance, metric conditioning / manifold regularity."""
    out: Dict[str, Array] = {
        "cyclicity_error": jnp.mean((recon[:, 0] - recon[:, -1]) ** 2),
        "latent_norm": jnp.mean(jnp.linalg.norm(z_seq, axis=-1)),
        "latent_variance": jnp.var(z_seq),
    }
    if metric is not None:
        z0 = z_seq[:, 0]
        gi = gm.g_inv(metric, z0)
        # batched [B,16,16] eigvalsh is the CLAUDE.md layout trap; this is
        # an eval-only monitoring metric, so cap the eigendecomposition at
        # 32 samples (statistically equivalent conditioning estimate)
        eigvals = jnp.linalg.eigvalsh(gi[:32])
        out["metric_conditioning"] = jnp.mean(eigvals[:, -1] / eigvals[:, 0])
        det_gi = jnp.exp(gm.logdet_g_inv(metric, z0))
        out["manifold_regularity"] = jnp.std(jnp.log(det_gi + 1e-8))
        out["metric_determinant"] = jnp.mean(det_gi)
    return out
