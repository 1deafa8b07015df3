"""Fused Pallas TPU kernels for the IAF density-direction pass.

The reference's IAF forward (density direction) is a Python loop of D full
MADE passes per block (reference: src/lib/src/pythae/models/normalizing_flows/
iaf/iaf_model.py:63-82); the temporal chain multiplies that by (T-1)
transitions x n_blocks, i.e. 224 sequential MADE evaluations per training
forward at the flagship config.  As XLA ops (lax.scan over dims) each pass is
~4 small matmuls plus glue — the train step is dominated by their sequential
launch latency, not FLOPs.

ONE kernel pair (get_fused_iaf_chain; get_fused_iaf is its n_transitions=1
case) runs the entire temporal chain — every MADE block, the D-step
autoregressive update, the dim flips, and all T-1 transitions — per launch,
on a 2-D grid (batch tiles outer, transitions inner):

- weights arrive mask-premultiplied and stacked per transition; the
  BlockSpec index maps pipeline each transition's stack HBM->VMEM, and each
  step is a clean [TB,H] x [H,H] MXU chain;
- the per-dim update uses a broadcasted-iota column select (no dynamic lane
  slicing);
- the dim flip is a [D,D] reversal-permutation matmul (guaranteed lowering,
  vs lane-reversal ops);
- the evolving latent is carried across a tile's transitions in VMEM
  scratch (TPU grids execute sequentially; each tile re-seeds at t==0);
- the backward kernel implements the exact VJP, sweeping transitions in
  reverse with the dz carry resident in the (per-tile-constant) output
  block.  Key property exploited: the MADE *input* at dim-step i equals the
  block's final output masked to columns < i (dims are written once, in
  order), so the only residuals needed are each block's output.  Weight
  gradients are written as PER-TILE partials and summed by XLA afterwards —
  cross-tile accumulation into a revisited output block would not be safe
  on the 2-D grid.

fp32 throughout with HIGHEST-precision matmuls (the outputs feed exp(-s);
see CLAUDE.md precision policy).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rlvae_tpu.flows.made import LOG_VAR_CLAMP, make_masks

# HIGHEST: full-f32 passes.  Mosaic supports only DEFAULT/HIGHEST; a
# same-process A/B showed no measurable speed difference here (the matmuls
# are tiny and latency-bound), so keep the accurate one — s feeds exp(-s).
HI = jax.lax.Precision.HIGHEST


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=HI)


def _dot_nt(a, b):
    """a @ b.T without materializing the transpose: [M,K] x [N,K] -> [M,N]."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=HI
    )


def _dot_tn(a, b):
    """a.T @ b without materializing the transpose: [K,M] x [K,N] -> [M,N]."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=HI
    )


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _made_pass(y, w0, b0, whs, bhs, wo, bo, d: int):
    """One MADE forward: returns (mu, s_pre, activations) with s un-clamped.

    Layer stack mirrors the reference exactly (made_model.py:124-137): masked
    layer 0 with NO activation, [masked, ReLU] pairs, masked output layer.
    """
    acts = []
    a = _dot(y, w0) + b0  # a0: no activation
    acts.append(a)
    for wh, bh in zip(whs, bhs):
        a = jnp.maximum(_dot(a, wh) + bh, 0.0)
        acts.append(a)
    out = _dot(a, wo) + bo  # [TB, 2D] (padded)
    return out[:, :d], out[:, d : 2 * d], acts


def _rev_matrix(d: int):
    """[D, D] reversal permutation (flip as a matmul: y @ R == y[:, ::-1])."""
    row = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    return jnp.where(row + col == d - 1, 1.0, 0.0).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Whole-chain mega-kernels: all T-1 temporal transitions in ONE program
# (a single IAF is the n_transitions == 1 case — get_fused_iaf delegates)
# ---------------------------------------------------------------------------
#
# The temporal chain launches one fused kernel per transition (7 fwd + 7 bwd
# at the flagship config).  These kernels run the ENTIRE chain per launch:
# grid=(batch_tiles, NT) with transitions innermost, each transition's
# weights pipelined HBM->VMEM by the BlockSpec index maps and the evolving
# latent carried across grid steps in VMEM scratch (TPU grids execute
# sequentially; each tile re-seeds its carry at t==0).  The backward writes
# per-tile weight-grad partials summed by XLA afterwards.


def _transition_fwd_body(x, blocks, col, rev, d: int, tb: int, fp_iters: int = 0):
    """One full IAF transition on arrays: returns (ys per block, y_final, ld).

    ``fp_iters == 0`` (default) is the exact D-step sequential update.
    ``fp_iters = K > 0`` solves each block's strictly triangular system
    ``y = (x - mu(y)) * exp(-s(y))`` by Jacobi fixed-point iteration
    instead: K full MADE passes (dim i is EXACT after i+1 iterations, so
    ``K >= D - 1`` is bit-exact) plus one final pass that evaluates
    (mu, s) at the converged y — the same self-consistent terms the
    sequential algorithm produces — cutting the block's pass count from
    D to K + 1.  Matches :func:`rlvae_tpu.flows.iaf.iaf_forward_fixedpoint`.
    """
    ld = jnp.zeros((tb, 1), jnp.float32)
    ys = []
    for w0, b0, whs, bhs, wo, bo in blocks:
        if fp_iters > 0:
            def fp_step(i, y):
                mu, s_pre, _ = _made_pass(y, w0, b0, whs, bhs, wo, bo, d)
                s = jnp.clip(s_pre, -LOG_VAR_CLAMP, LOG_VAR_CLAMP)
                return (x - mu) * jnp.exp(-s)

            y = jax.lax.fori_loop(
                0, fp_iters, fp_step, jnp.zeros((tb, d), jnp.float32)
            )
            mu, s_pre, _ = _made_pass(y, w0, b0, whs, bhs, wo, bo, d)
            s = jnp.clip(s_pre, -LOG_VAR_CLAMP, LOG_VAR_CLAMP)
            y = (x - mu) * jnp.exp(-s)
            ld = ld - jnp.sum(s, axis=1, keepdims=True)
        else:
            def step(i, carry):
                y, ld = carry
                mu, s_pre, _ = _made_pass(y, w0, b0, whs, bhs, wo, bo, d)
                s = jnp.clip(s_pre, -LOG_VAR_CLAMP, LOG_VAR_CLAMP)
                y_cand = (x - mu) * jnp.exp(-s)
                sel = col == i
                y = jnp.where(sel, y_cand, y)
                ld = ld - jnp.sum(jnp.where(sel, s, 0.0), axis=1, keepdims=True)
                return y, ld

            y, ld = jax.lax.fori_loop(
                0, d, step, (jnp.zeros((tb, d), jnp.float32), ld)
            )
        ys.append(y)
        x = _dot(y, rev)
    return ys, x, ld


def _transition_bwd_body(x_in, ys, dy, dld, blocks, col, rev, d: int, tb: int):
    """Exact VJP of one transition on arrays: returns (dx, per-block grads)."""
    n_blocks = len(blocks)
    dy = _dot(dy, rev)  # adjoint of the final flip
    d_blocks = [None] * n_blocks
    for b in range(n_blocks - 1, -1, -1):
        w0, b0, whs, bhs, wo, bo = blocks[b]
        y_out = ys[b]
        x_b = x_in if b == 0 else _dot(ys[b - 1], rev)

        def rstep(j, carry):
            i = d - 1 - j
            dy, dx, dw0, db0, dwh, dbh, dwo, dbo = carry
            dwh, dbh = list(dwh), list(dbh)
            sel = col == i
            y_in = jnp.where(col < i, y_out, 0.0)
            mu, s_pre, acts = _made_pass(y_in, w0, b0, whs, bhs, wo, bo, d)
            s = jnp.clip(s_pre, -LOG_VAR_CLAMP, LOG_VAR_CLAMP)
            e = jnp.exp(-s)
            u = (x_b - mu) * e

            du = jnp.where(sel, dy, 0.0)
            dmu = -du * e
            dx = dx + du * e
            ds = -du * u - jnp.where(sel, dld, 0.0)
            ds_pre = jnp.where(jnp.abs(s_pre) < LOG_VAR_CLAMP, ds, 0.0)

            dout = jnp.concatenate([dmu, ds_pre], axis=1)
            a_prev = acts[-1]
            da = _dot_nt(dout, wo)
            dwo = dwo + _dot_tn(a_prev, dout)
            dbo = dbo + jnp.sum(dout, axis=0, keepdims=True)
            for li in range(len(whs) - 1, -1, -1):
                g = jnp.where(acts[li + 1] > 0.0, da, 0.0)
                dwh[li] = dwh[li] + _dot_tn(acts[li], g)
                dbh[li] = dbh[li] + jnp.sum(g, axis=0, keepdims=True)
                da = _dot_nt(g, whs[li])
            dw0 = dw0 + _dot_tn(y_in, da)
            db0 = db0 + jnp.sum(da, axis=0, keepdims=True)
            dy_in = _dot_nt(da, w0)
            dy = dy + jnp.where(col < i, dy_in, 0.0)
            return dy, dx, dw0, db0, tuple(dwh), tuple(dbh), dwo, dbo

        zeros = (
            jnp.zeros((tb, d), jnp.float32),
            jnp.zeros_like(w0),
            jnp.zeros_like(b0),
            tuple(jnp.zeros_like(wh) for wh in whs),
            tuple(jnp.zeros_like(bh) for bh in bhs),
            jnp.zeros_like(wo),
            jnp.zeros_like(bo),
        )
        dy, dx, dw0, db0, dwh, dbh, dwo, dbo = jax.lax.fori_loop(
            0, d, rstep, (dy, *zeros)
        )
        d_blocks[b] = (dw0, db0, dwh, dbh, dwo, dbo)
        dy = _dot(dx, rev) if b > 0 else dx
    return dy, d_blocks


def _transition_bwd_adjoint_body(ys, dy, dld, blocks, rev, d: int, tb: int, n_sweeps: int):
    """Adjoint fixed-point VJP of one transition: returns (dx, per-block grads).

    Replaces :func:`_transition_bwd_body`'s D per-dim reverse steps (each a
    full MADE recompute + input VJP + weight-grad outer products) with the
    implicit-function adjoint solve.  Two structural facts make it exact:

    1. MADE's masks route output i only through hidden units of degree < i,
       whose activations depend only on inputs < i — so ONE forward pass at
       the block's full converged output y produces activations (and ReLU /
       clamp gates) identical, along every path that carries gradient, to
       the per-dim masked recomputes.  (Entries of the weight-grad outer
       products that differ correspond to masked weights and are zeroed by
       the mask multiply outside the kernel.)
    2. The block output solves y = F(x, y), F = (x − mu(y))·exp(−s(y)), so
       the output cotangent satisfies the affine fixed point
       λ = ĝ + (∂F/∂y)ᵀ λ  — and (∂F/∂y)ᵀ is strictly triangular
       (nilpotent index ≤ D), so ``n_sweeps >= D`` Jacobi sweeps solve it
       EXACTLY.  Each sweep is one input-only VJP (no weight grads); the
       weight gradients then come from a single full VJP at the converged
       adjoint, since Σ_i (per-dim cotangent backprops) with shared gates
       collapses into one backprop of the summed cotangent.

    Cost per block: 1 MADE pass + n_sweeps light VJPs + 1 grad VJP, vs the
    sequential body's D × (pass + VJP + outer products).  ``n_sweeps < D``
    gives the same weight-dependent approximation as the forward's
    ``fp_iters`` (validate with flows.iaf.fixedpoint_error)."""
    n_blocks = len(blocks)
    dy = _dot(dy, rev)  # adjoint of the final flip
    d_blocks = [None] * n_blocks
    for b in range(n_blocks - 1, -1, -1):
        w0, b0, whs, bhs, wo, bo = blocks[b]
        y_out = ys[b]
        _, s_pre, acts = _made_pass(y_out, w0, b0, whs, bhs, wo, bo, d)
        s = jnp.clip(s_pre, -LOG_VAR_CLAMP, LOG_VAR_CLAMP)
        e = jnp.exp(-s)
        gate_s = jnp.where(jnp.abs(s_pre) < LOG_VAR_CLAMP, 1.0, 0.0)
        gates = [jnp.where(acts[li + 1] > 0.0, 1.0, 0.0) for li in range(len(whs))]

        def dout_of(lam):
            return jnp.concatenate(
                [-lam * e, gate_s * (-lam * y_out - dld)], axis=1
            )

        def sweep(_, lam):
            da = _dot_nt(dout_of(lam), wo)
            for li in range(len(whs) - 1, -1, -1):
                da = _dot_nt(gates[li] * da, whs[li])
            return dy + _dot_nt(da, w0)

        lam = jax.lax.fori_loop(0, n_sweeps, sweep, dy)

        # one full VJP (with weight grads) at the converged adjoint
        dout = dout_of(lam)
        da = _dot_nt(dout, wo)
        dwo = _dot_tn(acts[-1], dout)
        dbo = jnp.sum(dout, axis=0, keepdims=True)
        dwh = [None] * len(whs)
        dbh = [None] * len(whs)
        for li in range(len(whs) - 1, -1, -1):
            g = gates[li] * da
            dwh[li] = _dot_tn(acts[li], g)
            dbh[li] = jnp.sum(g, axis=0, keepdims=True)
            da = _dot_nt(g, whs[li])
        dw0 = _dot_tn(y_out, da)
        db0 = jnp.sum(da, axis=0, keepdims=True)
        dx = lam * e
        d_blocks[b] = (dw0, db0, tuple(dwh), tuple(dbh), dwo, dbo)
        dy = _dot(dx, rev) if b > 0 else dx
    return dy, d_blocks


def _load_blocks(w0_ref, b0_ref, wh_ref, bh_ref, wo_ref, bo_ref, nb: int, nh: int):
    """Load one transition's (leading-1-indexed) weight blocks as arrays."""
    return [
        (
            w0_ref[0, b],
            b0_ref[0, b],
            [wh_ref[0, b, li] for li in range(nh - 1)],
            [bh_ref[0, b, li] for li in range(nh - 1)],
            wo_ref[0, b],
            bo_ref[0, b],
        )
        for b in range(nb)
    ]


def _iaf_chain_fwd_kernel(
    x_ref, w0_ref, b0_ref, wh_ref, bh_ref, wo_ref, bo_ref,
    z_ref, ld_ref, ys_ref,
    zc_ref,  # scratch: the latent carried across transitions
    *, d: int, n_blocks: int, n_hidden: int, tb: int, fp_iters: int = 0,
):
    """Grid (batch_tiles, transitions), transitions innermost: each tile's
    chain runs t=0..NT-1 consecutively with the latent carried in scratch;
    the next tile re-seeds at its t==0."""
    rev = _rev_matrix(d)
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, d), 1)

    @pl.when(pl.program_id(1) == 0)
    def _seed():
        zc_ref[...] = x_ref[...]

    blocks = _load_blocks(w0_ref, b0_ref, wh_ref, bh_ref, wo_ref, bo_ref, n_blocks, n_hidden)
    ys, y_final, ld = _transition_fwd_body(
        zc_ref[...], blocks, col, rev, d, tb, fp_iters
    )
    for b in range(n_blocks):
        ys_ref[0, b] = ys[b]
    z_ref[0] = y_final
    ld_ref[0] = ld
    zc_ref[...] = y_final


def _iaf_chain_bwd_kernel(
    x_ref, zs_ref, ys_ref, dy_ref, dld_ref,
    w0_ref, b0_ref, wh_ref, bh_ref, wo_ref, bo_ref,
    dx_ref, dw0_ref, db0_ref, dwh_ref, dbh_ref, dwo_ref, dbo_ref,
    *, d: int, n_blocks: int, n_hidden: int, tb: int, nt: int,
    adj_sweeps: int = 0,
):
    """Grid (batch_tiles, transitions), transitions innermost and REVERSED
    via the index maps (grid step t handles transition nt-1-t).  ``dx_ref``
    doubles as the dz carry: its block is constant within a tile's sweep, so
    it stays resident in VMEM; each tile re-seeds at its own first step.
    Weight grads are PER-TILE partials (leading tile axis in the outputs),
    summed by XLA outside the kernel — revisiting a transition's grad block
    across non-consecutive tiles would not be accumulation-safe."""
    t = pl.program_id(1)
    rev = _rev_matrix(d)
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, d), 1)

    # cotangent of this transition's output: its own dy plus what later
    # transitions propagated back (none at the tile's first grid step)
    carry = jnp.where(t == 0, 0.0, dx_ref[...])
    dy = dy_ref[0] + carry
    dld = dld_ref[0]
    # block-0 input: z0 for the first transition, the previous transition's
    # output otherwise (zs_ref's index map already selects transition rt-1)
    x_in = jnp.where(t == nt - 1, x_ref[...], zs_ref[0])

    blocks = _load_blocks(w0_ref, b0_ref, wh_ref, bh_ref, wo_ref, bo_ref, n_blocks, n_hidden)
    ys = [ys_ref[0, b] for b in range(n_blocks)]
    if adj_sweeps > 0:
        dx, d_blocks = _transition_bwd_adjoint_body(
            ys, dy, dld, blocks, rev, d, tb, adj_sweeps
        )
    else:
        dx, d_blocks = _transition_bwd_body(x_in, ys, dy, dld, blocks, col, rev, d, tb)

    dx_ref[...] = dx
    for b in range(n_blocks):
        dw0, db0, dwh, dbh, dwo, dbo = d_blocks[b]
        dw0_ref[0, 0, b] = dw0
        db0_ref[0, 0, b] = db0
        for li in range(n_hidden - 1):
            dwh_ref[0, 0, b, li] = dwh[li]
            dbh_ref[0, 0, b, li] = dbh[li]
        dwo_ref[0, 0, b] = dwo
        dbo_ref[0, 0, b] = dbo


# ---------------------------------------------------------------------------
# Host wrappers + custom VJP
# ---------------------------------------------------------------------------


def _stack_params(params: List[Dict[str, jax.Array]], masks, n_hidden: int):
    """Mask-premultiply and stack block params -> 6 stacked arrays.

    The output layer is stacked at its natural [NB, H, 2D] shape (no lane
    padding is applied); mu and s live at columns [:D] and [D:2D], which is
    exactly how _made_pass slices them."""
    w0 = jnp.stack([masks[0] * p["w0"] for p in params])  # [NB, D, H]
    b0 = jnp.stack([p["b0"][None, :] for p in params])  # [NB, 1, H]
    wh = jnp.stack(
        [
            jnp.stack([masks[li] * p[f"w{li}"] for li in range(1, n_hidden)])
            for p in params
        ]
    )  # [NB, NH-1, H, H]
    bh = jnp.stack(
        [jnp.stack([p[f"b{li}"][None, :] for li in range(1, n_hidden)]) for p in params]
    )  # [NB, NH-1, 1, H]
    wo = jnp.stack([masks[n_hidden] * p[f"w{n_hidden}"] for p in params])  # [NB, H, 2D]
    bo = jnp.stack([p[f"b{n_hidden}"][None, :] for p in params])  # [NB, 1, 2D]
    return w0, b0, wh, bh, wo, bo


# Mosaic's default scoped-VMEM budget is 16 MiB; the chain BACKWARD's
# per-grid-step working set (weight blocks + per-tile grad-partial output
# blocks, each [NB, NH-1, H, H] ~ 2 MiB, double-buffered once the batch
# spans multiple tiles) measures 17.9 MiB at TB=512 — 1.9 MiB over, so
# B > 512 train steps failed to compile.  v5e has 128 MiB physical VMEM;
# raise the scoped budget for the chain kernels only.
_VMEM_BUDGET = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _tile(b: int) -> Tuple[int, int]:
    tb = 512 if b > 512 else _ceil_to(b, 8)
    return tb, _ceil_to(b, tb)


def get_fused_iaf(
    input_dim: int, hidden_size: int, n_blocks: int, n_hidden: int,
    interpret: bool | None = None, fp_iters: int = 0,
    adj_sweeps: int | None = None,
):
    """Build the fused custom-VJP IAF forward for a static shape.

    Returns f(params, x) -> (y, logdet) differentiable w.r.t. both, exactly
    matching :func:`rlvae_tpu.flows.iaf.iaf_forward` (density direction).
    One IAF is the chain kernel with a single transition — there is only one
    kernel pair to maintain (see the whole-chain section below).

    Deliberately NOT lru_cached at this level: ``adj_sweeps=None`` must be
    resolved against ``ADJ_SWEEPS_OVERRIDE`` on EVERY call (inside
    :func:`get_fused_iaf_chain`, whose build layer is the cache) — a cache
    keyed on the unresolved ``None`` would return a stale backward after an
    A/B harness flips the override (the trace-time-gating gotcha,
    CLAUDE.md)."""
    chain = get_fused_iaf_chain(
        input_dim, hidden_size, n_blocks, n_hidden, 1, interpret, fp_iters,
        adj_sweeps,
    )

    def fused(params, x):
        z, ld = chain([params], x)
        return z[0], ld[0]

    return fused


# v5e interleaved A/B of the flagship train step, with BOTH arms compiled at
# the measured batch shape while the gate override was in force (an earlier
# measurement that warmed up at a different shape silently retraced both
# arms onto the same program and reported tunnel noise as ratios): the
# chain kernel wins consistently at every batch size — B=4 1.02x, B=16
# 1.04x, B=64 1.01x, B=128 1.08x, B=256 1.01x — so it is the default for
# all batches (the 2-D grid tiles batches beyond 512 rows).  The window
# gates exist for A/B forcing (scripts/bench_iaf_chain.py).
CHAIN_MIN_BATCH = 1
CHAIN_MAX_BATCH = 1 << 30


# A/B override for the backward-mode default (scripts/bench_iaf_fixedpoint.py):
# resolved BEFORE the build cache so each setting compiles its own program
# (the trace-time-gating gotcha — see CLAUDE.md).  None = auto.
ADJ_SWEEPS_OVERRIDE: int | None = None


def get_fused_iaf_chain(
    input_dim: int, hidden_size: int, n_blocks: int, n_hidden: int,
    n_transitions: int, interpret: bool | None = None, fp_iters: int = 0,
    adj_sweeps: int | None = None,
):
    """Resolve the backward mode, then build via the shape cache.

    See :func:`_build_fused_iaf_chain` for semantics.  ``adj_sweeps=None``
    (auto) resolves to the module override if set, else to the exact
    adjoint (D sweeps, or fp_iters+1 when the forward iterates)."""
    if adj_sweeps is None:
        adj_sweeps = ADJ_SWEEPS_OVERRIDE
    if adj_sweeps is None:
        adj_sweeps = input_dim if fp_iters == 0 else fp_iters + 1
    return _build_fused_iaf_chain(
        input_dim, hidden_size, n_blocks, n_hidden, n_transitions, interpret,
        fp_iters, adj_sweeps,
    )


@functools.lru_cache(maxsize=None)
def _build_fused_iaf_chain(
    input_dim: int, hidden_size: int, n_blocks: int, n_hidden: int,
    n_transitions: int, interpret: bool | None, fp_iters: int,
    adj_sweeps: int,
):
    """Build (and cache) the whole-chain fused IAF: ONE Pallas program for
    all ``n_transitions`` temporal transitions (2 launches per train step
    instead of 2 per transition).

    Returns f(params_chain, z0) -> (z_rest [NT, B, D], logdets [NT, B]),
    differentiable w.r.t. both, where ``params_chain`` is a list of NT
    per-transition IAF param lists (repeated entries — the temporal chain's
    last-flow reuse — get their gradients summed by the stacking AD outside).
    Matches chaining :func:`rlvae_tpu.flows.iaf.iaf_forward` per transition.

    ``fp_iters = K > 0`` switches each block to the Jacobi fixed-point
    solver (see :func:`_transition_fwd_body`): K + 1 MADE passes per block
    instead of D, bit-exact for K >= D - 1 (dim i of the iterate is exact
    after i+1 sweeps) and converged well below that when the coupling
    contracts.  Convergence at K < D-1 is WEIGHT-dependent: measured
    bit-exact at K=8 (D=16) for weights up to ~2x torch-Linear init scale
    at any input scale (incl. 1e10), but NOT for >=4x-scale weights —
    validate trained weights with
    :func:`rlvae_tpu.flows.iaf.fixedpoint_error` before lowering K.

    ``adj_sweeps`` selects the backward: ``None`` (auto) resolves to the
    adjoint fixed-point VJP (:func:`_transition_bwd_adjoint_body`) with
    D sweeps — EXACT, the nilpotent adjoint system terminates — when
    ``fp_iters == 0``, or ``fp_iters + 1`` sweeps otherwise; an explicit
    sweep count overrides; ``0`` forces the legacy per-dim sequential
    backward (:func:`_transition_bwd_body`).  Both backwards evaluate the
    implicit (exact-solution) VJP at the forward's converged y — their
    only residuals are each block's final output.
    """
    d, h, nb, nh, nt = input_dim, hidden_size, n_blocks, n_hidden, n_transitions
    masks = tuple(np.asarray(m, np.float32) for m in make_masks(d, [h] * nh))
    interp = (not _on_tpu()) if interpret is None else interpret

    def stack_chain(params_chain):
        per_t = [_stack_params(p, masks, nh) for p in params_chain]
        return tuple(jnp.stack([pt[i] for pt in per_t]) for i in range(6))

    def fwd_pallas(params_chain, x):
        b = x.shape[0]
        tb, b_pad = _tile(b)  # <=512-row tiles; grid handles any batch
        n_tiles = b_pad // tb
        w0, b0, wh, bh, wo, bo = stack_chain(params_chain)
        x_p = jnp.pad(x.astype(jnp.float32), ((0, b_pad - b), (0, 0)))
        wspec = lambda *shape: pl.BlockSpec(
            (1, *shape), lambda i, t: (t,) + (0,) * len(shape), memory_space=pltpu.VMEM
        )
        z, ld, ys = pl.pallas_call(
            functools.partial(
                _iaf_chain_fwd_kernel, d=d, n_blocks=nb, n_hidden=nh, tb=tb,
                fp_iters=fp_iters,
            ),
            grid=(n_tiles, nt),
            in_specs=[
                pl.BlockSpec((tb, d), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
                wspec(nb, d, h), wspec(nb, 1, h),
                wspec(nb, nh - 1, h, h), wspec(nb, nh - 1, 1, h),
                wspec(nb, h, 2 * d), wspec(nb, 1, 2 * d),
            ],
            out_specs=[
                pl.BlockSpec((1, tb, d), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tb, 1), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, nb, tb, d), lambda i, t: (t, 0, i, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nt, b_pad, d), jnp.float32),
                jax.ShapeDtypeStruct((nt, b_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((nt, nb, b_pad, d), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((tb, d), jnp.float32)],
            compiler_params=_VMEM_BUDGET,
            interpret=interp,
        )(x_p, w0, b0, wh, bh, wo, bo)
        return z[:, :b], ld[:, :b, 0], (z, ys)

    def bwd_pallas(params_chain, x, residuals, dz, dld):
        z_all, ys = residuals  # padded [NT, B_pad, D] / [NT, NB, B_pad, D]
        b = x.shape[0]
        tb, b_pad = _tile(b)
        n_tiles = b_pad // tb
        w0, b0, wh, bh, wo, bo = stack_chain(params_chain)
        x_p = jnp.pad(x.astype(jnp.float32), ((0, b_pad - b), (0, 0)))
        dz_p = jnp.pad(dz.astype(jnp.float32), ((0, 0), (0, b_pad - b), (0, 0)))
        dld_p = jnp.pad(dld.astype(jnp.float32), ((0, 0), (0, b_pad - b)))[..., None]
        r = lambda t: nt - 1 - t  # reverse transition order (inner grid axis)
        wspec = lambda *shape: pl.BlockSpec(
            (1, *shape), lambda i, t: (r(t),) + (0,) * len(shape), memory_space=pltpu.VMEM
        )
        # per-tile weight-grad partials: leading tile axis, summed after
        gspec = lambda *shape: pl.BlockSpec(
            (1, 1, *shape),
            lambda i, t: (i, r(t)) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )
        outs = pl.pallas_call(
            functools.partial(
                _iaf_chain_bwd_kernel, d=d, n_blocks=nb, n_hidden=nh, tb=tb, nt=nt,
                adj_sweeps=adj_sweeps,
            ),
            grid=(n_tiles, nt),
            in_specs=[
                pl.BlockSpec((tb, d), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
                # previous transition's output feeds transition rt as input;
                # clamped at rt==0 (unused there — the kernel selects x_ref)
                pl.BlockSpec(
                    (1, tb, d),
                    lambda i, t: (jnp.maximum(r(t) - 1, 0), i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, nb, tb, d), lambda i, t: (r(t), 0, i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((1, tb, d), lambda i, t: (r(t), i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tb, 1), lambda i, t: (r(t), i, 0), memory_space=pltpu.VMEM),
                wspec(nb, d, h), wspec(nb, 1, h),
                wspec(nb, nh - 1, h, h), wspec(nb, nh - 1, 1, h),
                wspec(nb, h, 2 * d), wspec(nb, 1, 2 * d),
            ],
            out_specs=[
                pl.BlockSpec((tb, d), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
                gspec(nb, d, h), gspec(nb, 1, h),
                gspec(nb, nh - 1, h, h), gspec(nb, nh - 1, 1, h),
                gspec(nb, h, 2 * d), gspec(nb, 1, 2 * d),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b_pad, d), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, nt, nb, d, h), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, nt, nb, 1, h), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, nt, nb, nh - 1, h, h), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, nt, nb, nh - 1, 1, h), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, nt, nb, h, 2 * d), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, nt, nb, 1, 2 * d), jnp.float32),
            ],
            compiler_params=_VMEM_BUDGET,
            interpret=interp,
        )(x_p, z_all, ys, dz_p, dld_p, w0, b0, wh, bh, wo, bo)
        dx = outs[0]
        # sum the per-tile partials (one XLA reduction per grad stack)
        dw0, db0, dwh, dbh, dwo, dbo = (o.sum(axis=0) for o in outs[1:])
        d_chain = []
        for ti in range(nt):
            d_params = []
            for bi in range(nb):
                blk = {
                    "w0": masks[0] * dw0[ti, bi],
                    "b0": db0[ti, bi, 0],
                    f"w{nh}": masks[nh] * dwo[ti, bi],
                    f"b{nh}": dbo[ti, bi, 0],
                }
                for li in range(1, nh):
                    blk[f"w{li}"] = masks[li] * dwh[ti, bi, li - 1]
                    blk[f"b{li}"] = dbh[ti, bi, li - 1, 0]
                d_params.append(blk)
            d_chain.append(d_params)
        return d_chain, dx[:b]

    @jax.custom_vjp
    def fused_chain(params_chain, x):
        z, ld, _ = fwd_pallas(params_chain, x)
        return z, ld

    def chain_fwd(params_chain, x):
        z, ld, res = fwd_pallas(params_chain, x)
        return (z, ld), (params_chain, x, res)

    def chain_bwd(res, cotangents):
        params_chain, x, residuals = res
        dz, dld = cotangents
        return bwd_pallas(params_chain, x, residuals, dz, dld)

    fused_chain.defvjp(chain_fwd, chain_bwd)
    return fused_chain
