"""Fused Pallas TPU kernels for the centroid-metric pipeline.

One kernel evaluates, per batch tile, the full chain the reference spreads
over many torch calls (reference: src/models/components/metric_tensor.py:98-182
and pythae rhvae_sampler.py:158-187):

    d2 -> w = exp(-d2/T^2) -> G^{-1} = w @ M + lbd I -> L = chol(G^{-1})
       -> logdet -> X = L^{-1} -> G = X^T X  [-> HMC grad / log-density]

Why a kernel at all: XLA runs this as ~10 small kernels with a ~270us
dispatch floor on the axon runtime, and the D=16 linear algebra tiles
terribly batch-first (16 of 128 lanes used).  The kernel keeps every
intermediate in VMEM in a *batch-last slab layout*: matrices live as D
column-slabs of shape [D, TB] so each Cholesky / substitution step is a
full-width VPU op over the batch, and the weighted sum of metric matrices is
a single [D^2, K] @ [K, TB] MXU matmul.

Data layout contract (see `_flat` helpers): flattened matrices are stored
column-major ("j-major"): row j*D+i holds A[i, j].  Symmetric outputs
(G^{-1}, G) are bitwise symmetric so the wrapper reshapes them directly;
the Cholesky factor is materialized j-major and transposed in the wrapper.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rlvae_tpu.geometry.metric import CentroidMetric
from rlvae_tpu.utils.output import ModelOutput


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# The kernels unroll the Cholesky/inversion in D (program size grows ~D^2),
# so large latent dims fall back to XLA (geometry/metric.py).  The K axis has
# two regimes, both fused:
#   - RESIDENT (small K): the [D^2, K_pad] matrix slab and the [K_pad, TB]
#     weight temporaries live in VMEM across the whole batch — one grid axis.
#   - CHUNKED (large K): a second, innermost grid axis walks K in KC-wide
#     chunks, accumulating w@M (and the HMC v contraction) into VMEM scratch;
#     the Cholesky/inversion epilogue runs on the last chunk.  VMEM use is
#     K-independent, so the dense single-chip path scales to K in the
#     hundreds of thousands (HBM-resident bank) before the EP-sharded bank
#     (parallel/metric_parallel.py) is needed for capacity or throughput.
# The resident envelope was MEASURED on v5e (scripts/_probe_k_envelope.py,
# outputs/k_scaling/): at D=16, K=2000 compiles only at TB<=128 and K=5000
# not at all — the 4 live [K_pad, TB] f32 weight slabs (d2 + diff + w +
# matmul operand staging), not the constant slabs, are what overflow the
# 16 MiB scoped-VMEM budget.  _resident_ok models exactly that.
_FUSED_MAX_DIM = 32
_RESIDENT_VMEM_BUDGET = 8 * 2**20  # headroom for out blocks + double buffers
_KC = 512  # K-chunk width (multiple of 128; [KC, TB] temporaries ~1 MiB)


def _resident_ok(d: int, k_pad: int, tb: int, n_m: int = 1) -> bool:
    """True when the single-grid kernel's VMEM working set fits: constant
    slabs (n_m matrix slabs + centroids) plus ~4 live [K_pad, TB] f32
    weight temporaries."""
    const = 4 * (n_m * d * d + d) * k_pad
    live = 16 * k_pad * tb
    return const + live <= _RESIDENT_VMEM_BUDGET


def fused_supported(metric: CentroidMetric) -> bool:
    """True when the fused kernels can serve this metric (resident OR
    chunked regime).

    Used by every `backend="auto"` dispatch (geometry/metric.py,
    samplers/hmc.py) so out-of-envelope metrics (large latent dim) degrade
    to the XLA path instead of failing Mosaic allocation at trace time.
    The K axis no longer bounds support: the chunked kernels' VMEM use is
    K-independent (the bank streams from HBM)."""
    k, d = metric.centroids.shape
    return d <= _FUSED_MAX_DIM


# ---------------------------------------------------------------------------
# In-kernel building blocks (operate on lists of [D, TB] column slabs)
# ---------------------------------------------------------------------------


def _weights_slab(z_ref, c_ref, inv_t2, d: int, k_real: int, k_pad: int, tb: int):
    """w_t [K_pad, TB] with padded-centroid columns masked to zero."""
    d2 = jnp.zeros((k_pad, tb), jnp.float32)
    for i in range(d):
        zi = z_ref[i, :].reshape(1, tb)  # [1, TB]
        ci = c_ref[i, :].reshape(k_pad, 1)  # [K, 1]
        diff = ci - zi
        d2 = d2 + diff * diff
    w = jnp.exp(-d2 * inv_t2)
    if k_pad != k_real:
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (k_pad, tb), 0)
        w = jnp.where(k_idx < k_real, w, 0.0)
    return w


def _weights_chunk(z_ref, c_ref, inv_t2, d: int, k0, k_real: int, kc: int, tb: int):
    """w chunk [KC, TB] for the K-chunked kernels; rows whose GLOBAL index
    k0+row reaches past the real bank are masked to zero (k0 is traced:
    program_id(1) * KC)."""
    d2 = jnp.zeros((kc, tb), jnp.float32)
    for i in range(d):
        diff = c_ref[i, :].reshape(kc, 1) - z_ref[i, :].reshape(1, tb)
        d2 = d2 + diff * diff
    w = jnp.exp(-d2 * inv_t2)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (kc, tb), 0) + k0
    return jnp.where(k_idx < k_real, w, 0.0)


def _gi_cols_from_acc(acc, lbd, d: int):
    """G^{-1} column slabs from an accumulated w@M slab [D^2, TB] + lbd I."""
    row = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)
    return [
        jnp.where(row == j, acc[j * d : (j + 1) * d, :] + lbd,
                  acc[j * d : (j + 1) * d, :])
        for j in range(d)
    ]


def _finish_weights(cz, zt, c2_ref, inv_t2, k_real: int, k_pad: int, tb: int):
    """exp(-d2/T^2) from the cross-term slab cz = c~.z~ (padding masked)."""
    z2 = jnp.sum(zt * zt, axis=0, keepdims=True)  # [1, TB]
    d2 = jnp.maximum(c2_ref[...] - 2.0 * cz + z2, 0.0)
    w = jnp.exp(-d2 * inv_t2)
    if k_pad != k_real:
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (k_pad, tb), 0)
        w = jnp.where(k_idx < k_real, w, 0.0)
    return w


def _weights_slab_mxu(
    z_ref, c_ref, c2_ref, mean_ref, inv_t2, d: int, k_real: int, k_pad: int, tb: int
):
    """MXU distance expansion in CENTROID-CENTERED coordinates
    (VERDICT r2 item 8): with m = mean(centroids), c~ = c - m, z~ = z - m,
    d2 = |c~|^2 - 2 c~.z~ + |z~|^2 rides one [K, D] @ [D, TB] matmul instead
    of the D-step elementwise loop.  Centering is the compensation: the
    cancellation error of the raw expansion scales with |z|^2 (~2e-5 weight
    error on the real artifacts — rejected in round 2); in centered
    coordinates it scales with the centroid SPREAD squared, which is what
    d2 itself measures, restoring fp32-level relative accuracy.  c~ and
    |c~|^2 are precomputed at trace time (_prep)."""
    zt = z_ref[...] - mean_ref[...]  # [D, TB]
    cz = jax.lax.dot_general(
        c_ref[...], zt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # 6 bf16 MXU passes
    )  # [K_pad, TB]
    return _finish_weights(cz, zt, c2_ref, inv_t2, k_real, k_pad, tb)


def _weights_slab_mxu3x(
    z_ref, ch_ref, cl_ref, c2_ref, mean_ref, inv_t2,
    d: int, k_real: int, k_pad: int, tb: int,
):
    """Centered MXU expansion with a manual bf16_3x cross term — BENCHMARK
    ONLY, measured and REJECTED (round 3, scripts/bench_mxu_dist.py):

    - accuracy: dropping the lo*lo term leaves ~sum_D (spread*2^-8)^2 ~
      2e-3 ABSOLUTE error in d2, which exp(-d2/T^2) amplifies by 1/T^2 —
      measured g_inv scaled max err 3.97e-3 vs 1.95e-6 for the HIGHEST
      arm: three decades outside the parity gates (HIGHEST's passes 4-6
      are exactly the lo*lo coverage this drops);
    - speed: 1666us vs the HIGHEST arm's 1709us at B=8192/TB=512 — the
      6->3 pass cut recovers ~2.5%, proving the distance matmul is NOT
      where the mxu arm spends its time (the weighted-sum matmul +
      unrolled Cholesky dominate), so no accuracy fix could make this
      path win either.

    Kept importable so the A/B stays reproducible; never enable in
    production paths.  (Mosaic lowers only DEFAULT/HIGHEST dot precisions,
    hence the manual hi/lo split: bf16 hi + bf16 lo residual, hi*hi +
    hi*lo + lo*hi, centroid splits precomputed at trace time, adds
    sequenced for the TB=2048 scoped-VMEM budget — still 40KB over, so
    the high arm runs at TB<=1792.)"""
    zt = z_ref[...] - mean_ref[...]  # [D, TB]
    zh = zt.astype(jnp.bfloat16)
    zl = (zt - zh.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot_kt(a, b):  # [D, K_pad] x [D, TB] -> [K_pad, TB], one bf16 pass
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    cz = dot_kt(ch_ref[...], zh)
    cz = cz + dot_kt(ch_ref[...], zl)
    cz = cz + dot_kt(cl_ref[...], zh)
    return _finish_weights(cz, zt, c2_ref, inv_t2, k_real, k_pad, tb)


def _gi_cols(m_ref, w, lbd, d: int, tb: int):
    """G^{-1} column slabs from the MXU matmul [D^2, K] @ [K, TB] + lbd I."""
    gi_flat = jax.lax.dot_general(
        m_ref[...],
        w,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # full-f32 MXU passes: default (bf16 inputs) costs ~0.4% error, far
        # above the parity gates (same reasoning as geometry.metric.g_inv)
        precision=jax.lax.Precision.HIGHEST,
    )  # [D^2, TB], j-major rows
    row = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)
    cols = []
    for j in range(d):
        slab = gi_flat[j * d : (j + 1) * d, :]
        cols.append(jnp.where(row == j, slab + lbd, slab))
    return cols


def _chol_cols(gi_cols, d: int):
    """Unrolled Cholesky over column slabs: L[:, j] as [D, TB]."""
    row = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)
    l_cols = []
    for j in range(d):
        v = gi_cols[j]
        for k in range(j):
            v = v - l_cols[k] * l_cols[k][j : j + 1, :]
        ljj = jnp.sqrt(v[j : j + 1, :])
        col = jnp.where(row >= j, v / ljj, 0.0)
        l_cols.append(col)
    return l_cols


def _inv_rows_from_chol(l_cols, d: int):
    """X = L^{-1} as row slabs x_rows[i][j] = X[i, j], each [D, TB]."""
    col = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)
    x_rows = []
    for i in range(d):
        v = jnp.where(col == i, 1.0, 0.0)  # e_i over the j index
        v = jnp.broadcast_to(v, l_cols[0].shape)
        for k in range(i):
            v = v - l_cols[k][i : i + 1, :] * x_rows[k]
        x_rows.append(v / l_cols[i][i : i + 1, :])
    return x_rows


def _g_cols_from_inv_rows(x_rows, d: int):
    """G = X^T X as column slabs: g_cols[j][i] = sum_k X[k,i] X[k,j]."""
    g_cols = []
    for j in range(d):
        acc = None
        for k in range(j, d):  # X strictly lower-triangular support: k >= j
            term = x_rows[k] * x_rows[k][j : j + 1, :]
            acc = term if acc is None else acc + term
        g_cols.append(acc)
    return g_cols


def _stack_cols(cols):
    return jnp.concatenate(cols, axis=0)  # [D^2, TB], j-major


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _g_inv_kernel(scal_ref, z_ref, c_ref, m_ref, out_ref, *, d, k_real, k_pad, tb):
    inv_t2, lbd = scal_ref[0, 0], scal_ref[0, 1]
    w = _weights_slab(z_ref, c_ref, inv_t2, d, k_real, k_pad, tb)
    gi = _stack_cols(_gi_cols(m_ref, w, lbd, d, tb))
    out_ref[...] = gi.T  # [TB, D^2]


def _bundle_kernel(
    scal_ref, z_ref, c_ref, m_ref, *rest, d, k_real, k_pad, tb, mxu_dist
):
    # the centered-expansion operands (cc, c2, mean) are only passed when
    # mxu_dist is set — the default path ships no unused VMEM buffers
    inv_t2, lbd = scal_ref[0, 0], scal_ref[0, 1]
    if mxu_dist == "high":
        ch_ref, cl_ref, c2_ref, mean_ref, gi_ref, l_ref, ld_ref, g_ref = rest
        w = _weights_slab_mxu3x(z_ref, ch_ref, cl_ref, c2_ref, mean_ref,
                                inv_t2, d, k_real, k_pad, tb)
    elif mxu_dist:
        cc_ref, c2_ref, mean_ref, gi_ref, l_ref, ld_ref, g_ref = rest
        w = _weights_slab_mxu(z_ref, cc_ref, c2_ref, mean_ref, inv_t2,
                              d, k_real, k_pad, tb)
    else:
        gi_ref, l_ref, ld_ref, g_ref = rest
        w = _weights_slab(z_ref, c_ref, inv_t2, d, k_real, k_pad, tb)
    gi_cols = _gi_cols(m_ref, w, lbd, d, tb)
    gi_ref[...] = _stack_cols(gi_cols).T

    l_cols = _chol_cols(gi_cols, d)
    l_ref[...] = _stack_cols(l_cols).T

    log_diag = sum(jnp.log(l_cols[j][j : j + 1, :]) for j in range(d))  # [1, TB]
    ld_ref[...] = 2.0 * log_diag.T  # logdet G^{-1}, [TB, 1]

    x_rows = _inv_rows_from_chol(l_cols, d)
    g_cols = _g_cols_from_inv_rows(x_rows, d)
    g_ref[...] = _stack_cols(g_cols).T


def _chol_bundle_kernel(
    scal_ref, z_ref, c_ref, m_ref, l_ref, ld_ref, *, d, k_real, k_pad, tb
):
    """Output-pruned bundle: chol(G^{-1}) + logdet only (VERDICT r3 item 5).

    The training hot path consumes ONLY the Cholesky factor (metric-aware
    posterior, riemannian_flow_vae.py:953-1002, and the Riemannian KL's
    triangular solve, riemannian_flow_vae.py:1004-1077) — the full bundle's
    triangular inversion + G = X^T X reconstruction (~2/3 of the kernel's
    post-factorization VPU work) and two of its three [D, D] HBM output
    slabs are dead weight there.  logdet comes along for free (D logs of
    the diagonal already in VMEM)."""
    inv_t2, lbd = scal_ref[0, 0], scal_ref[0, 1]
    w = _weights_slab(z_ref, c_ref, inv_t2, d, k_real, k_pad, tb)
    gi_cols = _gi_cols(m_ref, w, lbd, d, tb)
    l_cols = _chol_cols(gi_cols, d)
    l_ref[...] = _stack_cols(l_cols).T
    log_diag = sum(jnp.log(l_cols[j][j : j + 1, :]) for j in range(d))  # [1, TB]
    ld_ref[...] = 2.0 * log_diag.T  # logdet G^{-1}, [TB, 1]


# ---------------------------------------------------------------------------
# K-chunked kernels (large centroid banks).  Grid (B_tiles, K_tiles) with K
# innermost: each step accumulates this chunk's w @ M (and for HMC the v
# contraction) into VMEM scratch, which persists across the sequential TPU
# grid; the nonlinear epilogue (Cholesky, log-det, inversion, gradient
# assembly) runs once on the last chunk.  VMEM is K-independent — the bank
# streams from HBM through the [*, KC] block pipeline.
# ---------------------------------------------------------------------------


def _acc_chunk(scal_ref, z_ref, c_ref, m_ref, acc_ref, d, k_real, kc, tb):
    """Shared chunk body: accumulate w @ M for this K-chunk; returns the
    chunk's weight slab for kernels that need it again (HMC's v)."""
    inv_t2 = scal_ref[0, 0]
    jc = pl.program_id(1)
    w = _weights_chunk(z_ref, c_ref, inv_t2, d, jc * kc, k_real, kc, tb)
    contrib = jax.lax.dot_general(
        m_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [D^2, TB], j-major rows

    @pl.when(jc == 0)
    def _():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    acc_ref[...] += contrib
    return w


def _chol_bundle_kernel_kc(
    scal_ref, z_ref, c_ref, m_ref, l_ref, ld_ref, acc_ref, *,
    d, k_real, kc, n_kc, tb
):
    lbd = scal_ref[0, 1]
    _acc_chunk(scal_ref, z_ref, c_ref, m_ref, acc_ref, d, k_real, kc, tb)

    @pl.when(pl.program_id(1) == n_kc - 1)
    def _():
        gi_cols = _gi_cols_from_acc(acc_ref[...], lbd, d)
        l_cols = _chol_cols(gi_cols, d)
        l_ref[...] = _stack_cols(l_cols).T
        log_diag = sum(jnp.log(l_cols[j][j : j + 1, :]) for j in range(d))
        ld_ref[...] = 2.0 * log_diag.T


def _bundle_kernel_kc(
    scal_ref, z_ref, c_ref, m_ref, gi_ref, l_ref, ld_ref, g_ref, acc_ref, *,
    d, k_real, kc, n_kc, tb
):
    lbd = scal_ref[0, 1]
    _acc_chunk(scal_ref, z_ref, c_ref, m_ref, acc_ref, d, k_real, kc, tb)

    @pl.when(pl.program_id(1) == n_kc - 1)
    def _():
        gi_cols = _gi_cols_from_acc(acc_ref[...], lbd, d)
        gi_ref[...] = _stack_cols(gi_cols).T
        l_cols = _chol_cols(gi_cols, d)
        l_ref[...] = _stack_cols(l_cols).T
        log_diag = sum(jnp.log(l_cols[j][j : j + 1, :]) for j in range(d))
        ld_ref[...] = 2.0 * log_diag.T
        x_rows = _inv_rows_from_chol(l_cols, d)
        g_cols = _g_cols_from_inv_rows(x_rows, d)
        g_ref[...] = _stack_cols(g_cols).T


def _g_inv_kernel_kc(
    scal_ref, z_ref, c_ref, m_ref, out_ref, acc_ref, *, d, k_real, kc, n_kc, tb
):
    lbd = scal_ref[0, 1]
    _acc_chunk(scal_ref, z_ref, c_ref, m_ref, acc_ref, d, k_real, kc, tb)

    @pl.when(pl.program_id(1) == n_kc - 1)
    def _():
        out_ref[...] = _stack_cols(_gi_cols_from_acc(acc_ref[...], lbd, d)).T


def _hmc_kernel_kc(
    scal_ref, z_ref, c_ref, m_ref, m2_ref, logpi_ref, grad_ref,
    acc_ref, v_ref, *, d, k_real, kc, n_kc, tb
):
    inv_t2, lbd, log_eps = scal_ref[0, 0], scal_ref[0, 1], scal_ref[0, 2]
    jc = pl.program_id(1)
    w = _acc_chunk(scal_ref, z_ref, c_ref, m_ref, acc_ref, d, k_real, kc, tb)

    @pl.when(jc == 0)
    def _():
        v_ref[...] = jnp.zeros(v_ref.shape, v_ref.dtype)

    v_ref[...] += _v_slab(w, z_ref, c_ref, m2_ref, inv_t2, d, kc, tb)

    @pl.when(jc == n_kc - 1)
    def _():
        gi_cols = _gi_cols_from_acc(acc_ref[...], lbd, d)
        l_cols = _chol_cols(gi_cols, d)
        log_diag = sum(jnp.log(l_cols[j][j : j + 1, :]) for j in range(d))
        logpi_ref[...] = jnp.logaddexp(log_diag, log_eps).T
        x_rows = _inv_rows_from_chol(l_cols, d)
        g_cols = _g_cols_from_inv_rows(x_rows, d)
        v = v_ref[...]
        grad = jnp.zeros((d, tb), jnp.float32)
        for j in range(d):
            grad = grad + g_cols[j] * v[j : j + 1, :]
        grad_ref[...] = (-0.5 * grad).T


def _hmc_partial_kernel_kc(
    scal_ref, z_ref, c_ref, m_ref, m2_ref, gi_ref, v_out_ref,
    acc_ref, v_ref, *, d, k_real, kc, n_kc, tb
):
    inv_t2 = scal_ref[0, 0]
    jc = pl.program_id(1)
    w = _acc_chunk(scal_ref, z_ref, c_ref, m_ref, acc_ref, d, k_real, kc, tb)

    @pl.when(jc == 0)
    def _():
        v_ref[...] = jnp.zeros(v_ref.shape, v_ref.dtype)

    v_ref[...] += _v_slab(w, z_ref, c_ref, m2_ref, inv_t2, d, kc, tb)

    @pl.when(jc == n_kc - 1)
    def _():
        gi_ref[...] = acc_ref[...].T  # no + lbd I: EP partials psum first
        v_out_ref[...] = v_ref[...].T


def _chunk_in_specs(d: int, tb: int, kc: int, smem_cols: int, n_m: int = 1):
    """in_specs for (scalars, z, c, m[, m2]) under grid (B_tiles, K_tiles)."""
    mspec = pl.BlockSpec((d * d, kc), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    return [
        pl.BlockSpec((1, smem_cols), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((d, tb), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, kc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        *([mspec] * n_m),
    ]


@functools.partial(jax.jit, static_argnames=("tb", "interpret"))
def chol_bundle_pallas(
    metric: CentroidMetric, z: jax.Array, tb: int | None = None,
    interpret: bool | None = None,
) -> ModelOutput:
    """Fused (chol(G^{-1}), logdet G^{-1}) — the training hot path's pruned
    bundle.  Skips the triangular inversion, G reconstruction, and the
    G_inv/G HBM writes of :func:`metric_bundle_pallas`; use that one when G
    itself is consumed (full KL, distances, viz grids)."""
    b, d, k, k_pad, tb, kc, b_pad, z_t, c_t, m_t = _prep(metric, z, tb)
    interp = (not _on_tpu()) if interpret is None else interpret
    out_specs = [
        pl.BlockSpec((tb, d * d), lambda i, *r: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, 1), lambda i, *r: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b_pad, d * d), jnp.float32),
        jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
    ]
    if kc is None:
        l_jm, ld = pl.pallas_call(
            functools.partial(_chol_bundle_kernel, d=d, k_real=k, k_pad=k_pad, tb=tb),
            grid=(b_pad // tb,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((d, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d * d, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interp,
        )(_scalars(metric), z_t, c_t, m_t)
    else:
        l_jm, ld = pl.pallas_call(
            functools.partial(
                _chol_bundle_kernel_kc, d=d, k_real=k, kc=kc, n_kc=k_pad // kc, tb=tb
            ),
            grid=(b_pad // tb, k_pad // kc),
            in_specs=_chunk_in_specs(d, tb, kc, smem_cols=2),
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((d * d, tb), jnp.float32)],
            interpret=interp,
        )(_scalars(metric), z_t, c_t, m_t)
    chol = jnp.swapaxes(l_jm[:b].reshape(b, d, d), -1, -2)  # j-major -> lower-tri
    return ModelOutput(chol_g_inv=chol, logdet_g_inv=ld[:b, 0])


def _hmc_kernel(
    scal_ref, z_ref, c_ref, m_ref, m2_ref, logpi_ref, grad_ref, *, d, k_real, k_pad, tb
):
    """HMC target log-density + pythae-form analytic gradient, fully fused.

    logpi = logaddexp(log sqrt det G^{-1}, log eps)      (rhvae_sampler.py:158)
    grad  = -0.5 G^T v,  v[j] = (-2/T^2) sum_k w_k sum_i (c-z)[i,k] M_k[i,j]
                                                         (rhvae_sampler.py:163-187)
    The inner contraction is evaluated as D matmuls over the weighted diffs
    (never as the cancellation-prone difference of two large sums — z sits
    near the centroids, so sum(w c M) - sum(w z M) would eat the signal).
    """
    inv_t2, lbd, log_eps = scal_ref[0, 0], scal_ref[0, 1], scal_ref[0, 2]
    w = _weights_slab(z_ref, c_ref, inv_t2, d, k_real, k_pad, tb)
    gi_cols = _gi_cols(m_ref, w, lbd, d, tb)
    l_cols = _chol_cols(gi_cols, d)

    log_diag = sum(jnp.log(l_cols[j][j : j + 1, :]) for j in range(d))  # [1, TB]
    logpi_ref[...] = jnp.logaddexp(log_diag, log_eps).T  # [TB, 1]

    x_rows = _inv_rows_from_chol(l_cols, d)
    g_cols = _g_cols_from_inv_rows(x_rows, d)

    v = _v_slab(w, z_ref, c_ref, m2_ref, inv_t2, d, k_pad, tb)
    grad = jnp.zeros((d, tb), jnp.float32)
    for j in range(d):
        grad = grad + g_cols[j] * v[j : j + 1, :]
    grad_ref[...] = (-0.5 * grad).T  # [TB, D]


def _v_slab(w, z_ref, c_ref, m2_ref, inv_t2, d: int, k_pad: int, tb: int):
    """Scaled gradient contraction v[j, b] = (-2/T^2) sum_i sum_k
    (c[i,k]-z[i,b]) w[k,b] M_k[i,j], as D matmuls over the weighted diffs
    (never as the cancellation-prone difference of two large sums — z sits
    near the centroids, so sum(w c M) - sum(w z M) would eat the signal).
    ``m2_ref`` is the i-major flattened matrices (row i*D+j = M[:, i, j])."""
    v = jnp.zeros((d, tb), jnp.float32)
    for i in range(d):
        wd = w * (c_ref[i, :].reshape(k_pad, 1) - z_ref[i, :].reshape(1, tb))  # [K, TB]
        m_i = m2_ref[i * d : (i + 1) * d, :]  # [D(j), K]
        v = v + jax.lax.dot_general(
            m_i,
            wd,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return (-2.0 * inv_t2) * v


# ---------------------------------------------------------------------------
# Python wrappers
# ---------------------------------------------------------------------------


def _plan(b: int, d: int, k: int, tb: int | None, n_m: int = 1):
    """(TB, KC) kernel plan.  KC is None in the resident regime (whole bank
    VMEM-resident, one grid axis); otherwise the chunked kernels walk K in
    KC-wide chunks.  An explicitly passed TB is honored; the regime always
    follows the measured envelope (_resident_ok) so out-of-envelope shapes
    route to the chunked kernel instead of failing Mosaic allocation."""
    k_pad = _ceil_to(k, 128)
    if tb is None:
        # measured on v5e: small batches prefer minimal tiles (less padding +
        # grid-pipelining overhead); mid sizes peak at TB=512; very large
        # batches (>=32k) gain ~1.4x from TB=2048 (fewer grid steps, the
        # per-step pipelining overhead amortized) — K permitting
        if b >= 32768:
            tb = 2048
        else:
            tb = min(512, max(128, 1 << (max(b // 8, 1)).bit_length() - 1))
        while tb > 128 and not _resident_ok(d, k_pad, tb, n_m):
            tb //= 2
    if _resident_ok(d, k_pad, tb, n_m):
        return tb, None
    # chunked: [KC, TB] temporaries bound VMEM; cap TB at 512 (~1 MiB each)
    return min(tb, 512), _KC


def _prep(metric: CentroidMetric, z: jax.Array, tb: int | None, n_m: int = 1):
    b, d = z.shape
    k = metric.n_centroids
    tb, kc = _plan(b, d, k, tb, n_m)
    k_pad = _ceil_to(k, kc if kc else 128)
    b_pad = _ceil_to(b, tb)
    z_t = jnp.pad(z.astype(jnp.float32), ((0, b_pad - b), (0, 0))).T  # [D, B_pad]
    c_t = jnp.pad(metric.centroids, ((0, k_pad - k), (0, 0))).T  # [D, K_pad]
    # j-major flattened matrices: row j*D+i = M[:, i, j]
    m_t = jnp.pad(
        metric.matrices.transpose(2, 1, 0).reshape(d * d, k), ((0, 0), (0, k_pad - k))
    )  # [D^2, K_pad]
    return b, d, k, k_pad, tb, kc, b_pad, z_t, c_t, m_t


def _scalars(metric: CentroidMetric, extra=()):
    vals = [1.0 / metric.temperature**2, metric.regularization, *extra]
    return jnp.stack([jnp.asarray(v, jnp.float32) for v in vals]).reshape(1, -1)


@functools.partial(jax.jit, static_argnames=("tb", "interpret"))
def g_inv_pallas(
    metric: CentroidMetric, z: jax.Array, tb: int | None = None, interpret: bool | None = None
) -> jax.Array:
    """Fused G^{-1}(z) -> [B, D, D]."""
    b, d, k, k_pad, tb, kc, b_pad, z_t, c_t, m_t = _prep(metric, z, tb)
    interp = (not _on_tpu()) if interpret is None else interpret
    out_spec = pl.BlockSpec(
        (tb, d * d), lambda i, *r: (i, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b_pad, d * d), jnp.float32)
    if kc is None:
        out = pl.pallas_call(
            functools.partial(_g_inv_kernel, d=d, k_real=k, k_pad=k_pad, tb=tb),
            grid=(b_pad // tb,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((d, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d * d, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interp,
        )(_scalars(metric), z_t, c_t, m_t)
    else:
        out = pl.pallas_call(
            functools.partial(
                _g_inv_kernel_kc, d=d, k_real=k, kc=kc, n_kc=k_pad // kc, tb=tb
            ),
            grid=(b_pad // tb, k_pad // kc),
            in_specs=_chunk_in_specs(d, tb, kc, smem_cols=2),
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((d * d, tb), jnp.float32)],
            interpret=interp,
        )(_scalars(metric), z_t, c_t, m_t)
    return out[:b].reshape(b, d, d)  # j-major == i-major: G^{-1} is symmetric


@functools.partial(jax.jit, static_argnames=("tb", "interpret", "mxu_dist"))
def metric_bundle_pallas(
    metric: CentroidMetric, z: jax.Array, tb: int | None = None,
    interpret: bool | None = None, mxu_dist: bool | str = False,
) -> ModelOutput:
    """Fused (G^{-1}, chol(G^{-1}), logdet G^{-1}, G) in one kernel.

    ``mxu_dist=True`` routes the distance computation through the centered
    MXU expansion (_weights_slab_mxu) at Precision.HIGHEST;
    ``mxu_dist="high"`` uses Precision.HIGH (bf16_3x, half the MXU
    passes).  Pass it EXPLICITLY in A/B runs so each arm compiles its own
    program (static arg; see the trace-time A/B trap in CLAUDE.md).

    Large banks dispatch to the K-chunked kernel (elementwise distance path
    only — the chunk matmul already owns the MXU there)."""
    b, d, k, k_pad, tb, kc, b_pad, z_t, c_t, m_t = _prep(metric, z, tb)
    out_specs = [
        pl.BlockSpec((tb, d * d), lambda i, *r: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, d * d), lambda i, *r: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, 1), lambda i, *r: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, d * d), lambda i, *r: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b_pad, d * d), jnp.float32),
        jax.ShapeDtypeStruct((b_pad, d * d), jnp.float32),
        jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        jax.ShapeDtypeStruct((b_pad, d * d), jnp.float32),
    ]
    if kc is not None:
        interp = (not _on_tpu()) if interpret is None else interpret
        gi, l_jm, ld, gm = pl.pallas_call(
            functools.partial(
                _bundle_kernel_kc, d=d, k_real=k, kc=kc, n_kc=k_pad // kc, tb=tb
            ),
            grid=(b_pad // tb, k_pad // kc),
            in_specs=_chunk_in_specs(d, tb, kc, smem_cols=2),
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((d * d, tb), jnp.float32)],
            interpret=interp,
        )(_scalars(metric), z_t, c_t, m_t)
        chol = jnp.swapaxes(l_jm[:b].reshape(b, d, d), -1, -2)
        return ModelOutput(
            g_inv=gi[:b].reshape(b, d, d),
            chol_g_inv=chol,
            logdet_g_inv=ld[:b, 0],
            g=gm[:b].reshape(b, d, d),
        )
    extra_in = ()
    extra_specs = []
    if mxu_dist:
        mean_t = jnp.mean(metric.centroids, axis=0).astype(jnp.float32).reshape(d, 1)
        cc_t = c_t - mean_t  # centered (padded columns masked in-kernel)
        c2_t = jnp.sum(cc_t * cc_t, axis=0).reshape(k_pad, 1)
        cspec = pl.BlockSpec((d, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
        if mxu_dist == "high":
            ch_t = cc_t.astype(jnp.bfloat16)
            cl_t = (cc_t - ch_t.astype(jnp.float32)).astype(jnp.bfloat16)
            extra_in = (ch_t, cl_t, c2_t, mean_t)
            extra_specs = [cspec, cspec]
        else:
            extra_in = (cc_t, c2_t, mean_t)
            extra_specs = [cspec]
        extra_specs += [
            pl.BlockSpec((k_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    interp = (not _on_tpu()) if interpret is None else interpret
    gi, l_jm, ld, gm = pl.pallas_call(
        functools.partial(_bundle_kernel, d=d, k_real=k, k_pad=k_pad, tb=tb,
                          mxu_dist=mxu_dist),
        grid=(b_pad // tb,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((d, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d * d, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interp,
    )(_scalars(metric), z_t, c_t, m_t, *extra_in)
    chol = jnp.swapaxes(l_jm[:b].reshape(b, d, d), -1, -2)  # j-major -> lower-tri
    return ModelOutput(
        g_inv=gi[:b].reshape(b, d, d),
        chol_g_inv=chol,
        logdet_g_inv=ld[:b, 0],
        g=gm[:b].reshape(b, d, d),
    )


# ---------------------------------------------------------------------------
# Differentiable fused entry points for the training hot path
# ---------------------------------------------------------------------------
#
# The train step needs gradients through chol(G^{-1}) (metric-aware posterior,
# riemannian_flow_vae.py:953-1002) and G (full KL / distances).  The bundle
# kernel serves the forward; the backward recomputes through the XLA
# reference implementation (rlvae_tpu.geometry.metric) via jax.vjp — small
# unrolled-linalg ops, and exactly the gradients the parity tests check.


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def chol_g_inv_fused(metric: CentroidMetric, z: jax.Array, jitter: float = 0.0):
    """L with L L^T = G^{-1}(z) + jitter*I — fused Pallas forward (the
    output-pruned chol-only kernel: the posterior/KL hot path never pays for
    the triangular inversion or the G/G_inv HBM writes)."""
    m = (
        metric.replace(regularization=metric.regularization + jitter)
        if jitter
        else metric
    )
    return chol_bundle_pallas(m, z).chol_g_inv


def _chol_fwd(metric, z, jitter):
    return chol_g_inv_fused(metric, z, jitter), (metric, z)


def _chol_bwd(jitter, res, ct):
    from rlvae_tpu.geometry import metric as _gm

    metric, z = res
    _, vjp = jax.vjp(lambda m, zz: _gm._chol_g_inv_xla(m, zz, jitter), metric, z)
    return vjp(ct)


chol_g_inv_fused.defvjp(_chol_fwd, _chol_bwd)


@jax.custom_vjp
def g_fused(metric: CentroidMetric, z: jax.Array):
    """G(z) = [G^{-1}(z)]^{-1} — fused Pallas forward."""
    return metric_bundle_pallas(metric, z).g


def _g_fwd(metric, z):
    return g_fused(metric, z), (metric, z)


def _g_bwd(res, ct):
    from rlvae_tpu.geometry import metric as _gm

    metric, z = res
    _, vjp = jax.vjp(lambda m, zz: _gm._g_xla(m, zz), metric, z)
    return vjp(ct)


g_fused.defvjp(_g_fwd, _g_bwd)


@functools.partial(jax.jit, static_argnames=("eps", "tb", "interpret"))
def hmc_terms_pallas(
    metric: CentroidMetric,
    z: jax.Array,
    eps: float = 1e-10,
    tb: int | None = None,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """(log pi(z), grad log pi(z)) for the manifold HMC sampler, one kernel.

    Matches pythae's target and closed-form gradient exactly
    (reference: pythae rhvae_sampler.py:158-187); see
    rlvae_tpu.geometry.metric.grad_log_sqrt_det_g_inv for the math note.
    """
    b, d, k, k_pad, tb, kc, b_pad, z_t, c_t, m_t = _prep(metric, z, tb, n_m=2)
    interp = (not _on_tpu()) if interpret is None else interpret
    # i-major flattened matrices: row i*D+j = M[:, i, j]
    m_t2 = jnp.pad(
        metric.matrices.transpose(1, 2, 0).reshape(d * d, k), ((0, 0), (0, k_pad - k))
    )
    out_specs = [
        pl.BlockSpec((tb, 1), lambda i, *r: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, d), lambda i, *r: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        jax.ShapeDtypeStruct((b_pad, d), jnp.float32),
    ]
    if kc is None:
        logpi, grad = pl.pallas_call(
            functools.partial(_hmc_kernel, d=d, k_real=k, k_pad=k_pad, tb=tb),
            grid=(b_pad // tb,),
            in_specs=[
                pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((d, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d * d, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d * d, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interp,
        )(_scalars(metric, extra=(math.log(eps),)), z_t, c_t, m_t, m_t2)
    else:
        logpi, grad = pl.pallas_call(
            functools.partial(
                _hmc_kernel_kc, d=d, k_real=k, kc=kc, n_kc=k_pad // kc, tb=tb
            ),
            grid=(b_pad // tb, k_pad // kc),
            in_specs=_chunk_in_specs(d, tb, kc, smem_cols=3, n_m=2),
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((d * d, tb), jnp.float32),
                pltpu.VMEM((d, tb), jnp.float32),
            ],
            interpret=interp,
        )(_scalars(metric, extra=(math.log(eps),)), z_t, c_t, m_t, m_t2)
    return logpi[:b, 0], grad[:b]


def _hmc_partial_kernel(
    scal_ref, z_ref, c_ref, m_ref, m2_ref, gi_ref, v_ref, *, d, k_real, k_pad, tb
):
    """Shard-local EP partials: the weighted metric sum WITHOUT the + lbd I
    term and the scaled gradient contraction v = (-2/T^2) sum_k w_k M_k^T
    (c_k - z).  Everything nonlinear (Cholesky, log-det, inverse, G^T v)
    happens AFTER the cross-device psum of these outputs
    (parallel/metric_parallel.py), so this kernel is exactly the
    K-proportional part of the HMC terms."""
    inv_t2 = scal_ref[0, 0]
    w = _weights_slab(z_ref, c_ref, inv_t2, d, k_real, k_pad, tb)
    gi_cols = _gi_cols(m_ref, w, 0.0, d, tb)
    gi_ref[...] = _stack_cols(gi_cols).T
    v_ref[...] = _v_slab(w, z_ref, c_ref, m2_ref, inv_t2, d, k_pad, tb).T  # [TB, D]


@functools.partial(jax.jit, static_argnames=("tb", "interpret"))
def hmc_partials_pallas(
    metric: CentroidMetric,
    z: jax.Array,
    tb: int | None = None,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """(G^{-1} partial [B, D, D] WITHOUT + lbd I, scaled gradient contraction
    v [B, D]) over this metric's (shard of the) centroid bank — the fused
    kernel behind the centroid-sharded HMC terms.  psum these across bank
    shards, then finish with + lbd I / Cholesky / inverse locally."""
    b, d, k, k_pad, tb, kc, b_pad, z_t, c_t, m_t = _prep(metric, z, tb, n_m=2)
    interp = (not _on_tpu()) if interpret is None else interpret
    m_t2 = jnp.pad(
        metric.matrices.transpose(1, 2, 0).reshape(d * d, k), ((0, 0), (0, k_pad - k))
    )
    out_specs = [
        pl.BlockSpec((tb, d * d), lambda i, *r: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, d), lambda i, *r: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b_pad, d * d), jnp.float32),
        jax.ShapeDtypeStruct((b_pad, d), jnp.float32),
    ]
    if kc is None:
        gi, v = pl.pallas_call(
            functools.partial(_hmc_partial_kernel, d=d, k_real=k, k_pad=k_pad, tb=tb),
            grid=(b_pad // tb,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((d, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d * d, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d * d, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interp,
        )(_scalars(metric), z_t, c_t, m_t, m_t2)
    else:
        gi, v = pl.pallas_call(
            functools.partial(
                _hmc_partial_kernel_kc, d=d, k_real=k, kc=kc, n_kc=k_pad // kc, tb=tb
            ),
            grid=(b_pad // tb, k_pad // kc),
            in_specs=_chunk_in_specs(d, tb, kc, smem_cols=2, n_m=2),
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((d * d, tb), jnp.float32),
                pltpu.VMEM((d, tb), jnp.float32),
            ],
            interpret=interp,
        )(_scalars(metric), z_t, c_t, m_t, m_t2)
    # j-major rows reshape directly: the partial sum of SPD M_k is symmetric
    # (same convention as g_inv_pallas)
    return gi[:b].reshape(b, d, d), v[:b]
