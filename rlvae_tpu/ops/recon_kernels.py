"""Fused decoder-output + sigmoid + MSE Pallas kernels (loss never
materializes the reconstruction).

The train step is HBM-byte-bound (outputs/step_breakdown/: ~34 GB moved at
B=4096 vs a ~7 GB algorithmic floor; XLA puts forward+grad at ~75-84% of
HBM bandwidth and <20% of peak flops).  Almost all of those bytes are
recon-sized [B*T, C*H*W] tensors: the final decoder matmul's output, the
sigmoid, the residual, and their cotangents each cost ~0.8-1.6 GB per pass
at the flagship shape.  XLA cannot fuse a matmul into a scalar-reducing
consumer, so the [B*T, 12288] pre-activation round-trips HBM several times
per step even under ``remat_decode``.

These kernels compute, per (batch-tile, lane-tile) grid step entirely in
VMEM,

    loss = sum_m rw[m] * sum_n (sigmoid(h[m] @ w[:, n] + b[n]) - x[m, n])^2

and the exact custom VJP (dh, dw, db) by recomputing the tile's
pre-activation in the backward — so the only recon-sized HBM traffic left
is reading ``x`` itself (once forward, once backward).

Reference semantics: the reconstruction path of
/root/reference/src/models/riemannian_flow_vae.py:1192-1197 (per-frame MSE,
closed-loop frame-0 double count via ``rw``) over pythae's
Decoder_AE_MLP final layer (lib/src/pythae/models/nn/
default_architectures.py:265-331: Dense -> sigmoid).

Numerics: the MXU consumes h/w (and in the backward the cotangent) as
bf16 with fp32 accumulation; sigmoid/residual/reduction run in fp32 on the
VPU.  That is strictly tighter than the ``out_dtype=bfloat16`` XLA path it
replaces (which keeps pre-activation, sigmoid AND residual in bf16), and
looser than the fp32-parity path — it is an opt-in training-throughput
knob (models/rlvae.py ``fused_decode_mse``), not the parity default.

Exported:
- decode_mse_xla: reference XLA implementation (fp32), autodiff-friendly.
- decode_mse: custom-VJP dispatcher — Pallas on TPU, XLA elsewhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _col_mask(j, nt: int, n_real: int, dtype=jnp.float32):
    """[1, NT] mask zeroing padded lanes in the last column tile."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, nt), 1) + j * nt
    return (col < n_real).astype(dtype)


def _tile_fwd(h_ref, w_ref, b_ref, x_ref, rw_ref, j, nt, n_real):
    """Shared forward recompute: (residual d [TB, NT] f32, sigmoid s)."""
    pre = jax.lax.dot_general(
        h_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[...].astype(jnp.float32)
    s = jax.nn.sigmoid(pre)
    d = (s - x_ref[...].astype(jnp.float32)) * _col_mask(j, nt, n_real)
    return d, s


def _fwd_kernel(h_ref, w_ref, b_ref, x_ref, rw_ref, acc_ref, *, nt, n_real):
    i, j = pl.program_id(0), pl.program_id(1)
    d, _ = _tile_fwd(h_ref, w_ref, b_ref, x_ref, rw_ref, j, nt, n_real)
    val = jnp.sum(rw_ref[...] * jnp.sum(d * d, axis=1, keepdims=True))

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += val.reshape(1, 1)


def _dpre(h_ref, w_ref, b_ref, x_ref, rw_ref, j, nt, n_real):
    """d(loss)/d(pre-activation) for one tile, in bf16 for the MXU."""
    d, s = _tile_fwd(h_ref, w_ref, b_ref, x_ref, rw_ref, j, nt, n_real)
    return (rw_ref[...] * 2.0 * d * s * (1.0 - s)).astype(jnp.bfloat16)


def _bwd_dh_kernel(h_ref, w_ref, b_ref, x_ref, rw_ref, dh_ref, *, nt, n_real):
    # grid (Mi, Nj), j innermost: dh block (i, 0) accumulates consecutively
    j = pl.program_id(1)
    dp = _dpre(h_ref, w_ref, b_ref, x_ref, rw_ref, j, nt, n_real)
    contrib = jax.lax.dot_general(  # [TB, NT] @ [NT, H]^T -> [TB, H]
        dp, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        dh_ref[...] = jnp.zeros_like(dh_ref)

    dh_ref[...] += contrib


def _bwd_dw_kernel(h_ref, w_ref, b_ref, x_ref, rw_ref, dw_ref, db_ref, *,
                   nt, n_real):
    # grid (Nj, Mi), i innermost: dw/db blocks (0, j) accumulate consecutively
    j, i = pl.program_id(0), pl.program_id(1)
    dp = _dpre(h_ref, w_ref, b_ref, x_ref, rw_ref, j, nt, n_real)
    contrib = jax.lax.dot_general(  # [TB, H]^T @ [TB, NT] -> [H, NT]
        h_ref[...], dp, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dw_ref[...] += contrib
    db_ref[...] += jnp.sum(dp.astype(jnp.float32), axis=0, keepdims=True)


def _pad_rows(a, m_pad):
    return jnp.pad(a, ((0, m_pad - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))


def _prep(h, w, b, x, rw, tb, nt):
    m, hd = h.shape
    n = w.shape[1]
    m_pad, n_pad = _ceil_to(m, tb), _ceil_to(n, nt)
    hp = _pad_rows(h.astype(jnp.bfloat16), m_pad)
    xp = jnp.pad(x, ((0, m_pad - m), (0, n_pad - n)))
    rwp = _pad_rows(rw.astype(jnp.float32).reshape(m, 1), m_pad)  # pad rows: rw=0
    wp = jnp.pad(w.astype(jnp.bfloat16), ((0, 0), (0, n_pad - n)))
    bp = jnp.pad(b.astype(jnp.float32), (0, n_pad - n)).reshape(1, n_pad)
    return m, hd, n, m_pad, n_pad, hp, wp, bp, xp, rwp


def _specs(tb, nt, hd, m_grid_first):
    """BlockSpecs for (h, w, b, x, rw) under grid (Mi, Nj) or (Nj, Mi)."""
    if m_grid_first:
        hm, xm = (lambda i, j: (i, 0)), (lambda i, j: (i, j))
        wm = bm = lambda i, j: (0, j)
        rm = lambda i, j: (i, 0)
    else:
        hm, xm = (lambda j, i: (i, 0)), (lambda j, i: (i, j))
        wm = bm = lambda j, i: (0, j)
        rm = lambda j, i: (i, 0)
    v = pltpu.VMEM
    return [
        pl.BlockSpec((tb, hd), hm, memory_space=v),
        pl.BlockSpec((hd, nt), wm, memory_space=v),
        pl.BlockSpec((1, nt), bm, memory_space=v),
        pl.BlockSpec((tb, nt), xm, memory_space=v),
        pl.BlockSpec((tb, 1), rm, memory_space=v),
    ]


@functools.partial(jax.jit, static_argnames=("tb", "nt", "interpret"))
def _fwd_pallas(h, w, b, x, rw, tb, nt, interpret):
    m, hd, n, m_pad, n_pad, hp, wp, bp, xp, rwp = _prep(h, w, b, x, rw, tb, nt)
    acc = pl.pallas_call(
        functools.partial(_fwd_kernel, nt=nt, n_real=n),
        grid=(m_pad // tb, n_pad // nt),
        in_specs=_specs(tb, nt, hd, m_grid_first=True),
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(hp, wp, bp, xp, rwp)
    return acc[0, 0]


@functools.partial(jax.jit, static_argnames=("tb", "nt", "interpret"))
def _bwd_pallas(h, w, b, x, rw, g, tb, nt, interpret):
    m, hd, n, m_pad, n_pad, hp, wp, bp, xp, rwp = _prep(h, w, b, x, rw, tb, nt)
    grid_m, grid_n = m_pad // tb, n_pad // nt
    dh = pl.pallas_call(
        functools.partial(_bwd_dh_kernel, nt=nt, n_real=n),
        grid=(grid_m, grid_n),
        in_specs=_specs(tb, nt, hd, m_grid_first=True),
        out_specs=pl.BlockSpec((tb, hd), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, hd), jnp.float32),
        interpret=interpret,
    )(hp, wp, bp, xp, rwp)
    dw, db = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, nt=nt, n_real=n),
        grid=(grid_n, grid_m),
        in_specs=_specs(tb, nt, hd, m_grid_first=False),
        out_specs=[
            pl.BlockSpec((hd, nt), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hd, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(hp, wp, bp, xp, rwp)
    gf = g.astype(jnp.float32)
    return (gf * dh[:m].astype(h.dtype),
            gf * dw[:, :n].astype(w.dtype),
            gf * db[0, :n].astype(b.dtype))


def decode_mse_xla(h, w, b, x, rw):
    """Reference fp32 implementation (autodiff provides the backward)."""
    pre = jnp.dot(h.astype(jnp.float32), w.astype(jnp.float32),
                  preferred_element_type=jnp.float32) + b.astype(jnp.float32)
    d = jax.nn.sigmoid(pre) - x.astype(jnp.float32)
    return jnp.sum(rw.astype(jnp.float32) * jnp.sum(d * d, axis=1))


# default tiles: TB=256 batch rows x NT=1024 lanes.  The binding block is
# the backward's double-buffered dw output ([H, NT] f32): NT=1536 measured
# 336 KB OVER the 16 MiB scoped-VMEM limit at the flagship shape (12288
# lanes, H=512); NT=1024 totals ~11 MiB with full 128-lane fill and a
# 512-deep contraction, and divides the flagship lane count exactly
_TB, _NT = 256, 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def decode_mse(h, w, b, x, rw, tb=_TB, nt=_NT, interpret=None):
    """sum_m rw[m] * ||sigmoid(h[m] @ w + b) - x[m]||^2 without HBM recon.

    h: [M, H] final decoder hidden (post-ReLU), w: [H, N], b: [N],
    x: [M, N] flattened targets, rw: [M] per-row loss weights (carries the
    closed-loop frame-0 double count and any masking; padded rows get 0).
    Differentiable in (h, w, b).  Pallas on TPU; XLA fp32 elsewhere.
    """
    interp = (not _on_tpu()) if interpret is None else interpret
    return _fwd_pallas(h, w, b, x, rw, tb, nt, interp)


def _vjp_fwd(h, w, b, x, rw, tb, nt, interpret):
    interp = (not _on_tpu()) if interpret is None else interpret
    return _fwd_pallas(h, w, b, x, rw, tb, nt, interp), (h, w, b, x, rw)


def _vjp_bwd(tb, nt, interpret, res, g):
    h, w, b, x, rw = res
    interp = (not _on_tpu()) if interpret is None else interpret
    dh, dw, db = _bwd_pallas(h, w, b, x, rw, g, tb, nt, interp)
    return dh, dw, db, jnp.zeros_like(x), jnp.zeros_like(rw)


decode_mse.defvjp(_vjp_fwd, _vjp_bwd)
