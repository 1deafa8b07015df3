"""Parity tests for the fused Pallas IAF kernels (rlvae_tpu/ops/iaf_kernels.py).

Run in interpreter mode on the CPU test mesh; the kernel must match the XLA
reference implementation (rlvae_tpu/flows/iaf.py, itself torch-parity-tested
in test_flows.py) bit-for-bit in equal precision — forward, log-det, input
gradient, and every weight/bias gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlvae_tpu.flows.iaf import iaf_forward, iaf_masks, init_iaf
from rlvae_tpu.ops.iaf_kernels import get_fused_iaf

D, H, NB, NH = 16, 64, 2, 3


@pytest.fixture(scope="module")
def setup():
    params = init_iaf(jax.random.PRNGKey(0), D, H, NB, NH)
    masks = iaf_masks(D, H, NH)
    fused = get_fused_iaf(D, H, NB, NH, interpret=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, D)).astype(np.float32))
    return params, masks, fused, x


def test_forward_parity(setup):
    params, masks, fused, x = setup
    y_ref, ld_ref = iaf_forward(params, masks, x)
    y_k, ld_k = fused(params, x)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld_k), np.asarray(ld_ref), rtol=1e-6, atol=1e-6)


def test_gradient_parity(setup):
    params, masks, fused, x = setup

    def loss_ref(p, x):
        y, ld = iaf_forward(p, masks, x)
        return jnp.sum(jnp.sin(y)) + 2.0 * jnp.sum(ld)

    def loss_k(p, x):
        y, ld = fused(p, x)
        return jnp.sum(jnp.sin(y)) + 2.0 * jnp.sum(ld)

    gr_p, gr_x = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gk_p, gk_x = jax.grad(loss_k, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gk_x), np.asarray(gr_x), rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gr_p), jax.tree_util.tree_leaves(gk_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5)


def test_clamp_boundary_gradient(setup):
    """The +-1.5 log-sigma clamp must zero gradients outside the window in the
    kernel exactly as jnp.clip does in the XLA path."""
    params, masks, fused, x = setup
    # scale the final-layer weights so some s_pre exceed the clamp
    big = jax.tree_util.tree_map(lambda a: a, params)
    big[0]["w3"] = big[0]["w3"] * 30.0

    def ld_ref(p, x):
        return jnp.sum(iaf_forward(p, masks, x)[1])

    def ld_k(p, x):
        return jnp.sum(fused(p, x)[1])

    np.testing.assert_allclose(float(ld_k(big, x)), float(ld_ref(big, x)), rtol=1e-6)
    ga = jax.grad(ld_ref)(big, x)
    gb = jax.grad(ld_k)(big, x)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5)


def test_temporal_chain_fused_matches_xla(setup):
    """The fused per-transition step reproduces apply_temporal_flows exactly,
    including last-flow reuse beyond n_flows (flow_manager.py:49-55)."""
    from rlvae_tpu.flows.temporal import TemporalFlowConfig, apply_temporal_flows

    cfg = TemporalFlowConfig(D, 2, H, NB, NH, backend="xla")
    flows = cfg.init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(3, D)).astype(np.float32))
    z_x, ld_x = apply_temporal_flows(cfg, flows, x, 5)

    fused = get_fused_iaf(D, H, NB, NH, interpret=True)
    cur, zs, lds = x, [x], []
    for t in range(1, 5):
        cur, ld = fused(flows[min(t - 1, len(flows) - 1)], cur)
        zs.append(cur)
        lds.append(ld)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(zs, 1)), np.asarray(z_x), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jnp.stack(lds, 1)), np.asarray(ld_x), rtol=1e-5, atol=1e-5
    )


# ---------------------------------------------------------------------------
# Whole-chain mega-kernel (get_fused_iaf_chain): one program for all T-1
# transitions, vs the XLA per-transition reference
# ---------------------------------------------------------------------------


def _chain_ref(flows, masks, x, nt):
    """XLA reference: chain iaf_forward with last-flow reuse."""
    cur, zs, lds = x, [], []
    for t in range(nt):
        cur, ld = iaf_forward(flows[min(t, len(flows) - 1)], masks, cur)
        zs.append(cur)
        lds.append(ld)
    return jnp.stack(zs, 0), jnp.stack(lds, 0)  # [NT, B, D], [NT, B]


@pytest.fixture(scope="module")
def chain_setup():
    from rlvae_tpu.ops.iaf_kernels import get_fused_iaf_chain

    masks = iaf_masks(D, H, NH)
    flows = [init_iaf(jax.random.PRNGKey(i), D, H, NB, NH) for i in range(2)]
    nt = 4  # 2 flows + last-flow reuse for transitions 2,3
    chain = get_fused_iaf_chain(D, H, NB, NH, nt, interpret=True)
    params_chain = [flows[min(t, len(flows) - 1)] for t in range(nt)]
    x = jnp.asarray(np.random.default_rng(2).normal(size=(5, D)).astype(np.float32))
    return flows, masks, chain, params_chain, x, nt


def test_chain_forward_parity(chain_setup):
    flows, masks, chain, params_chain, x, nt = chain_setup
    z_ref, ld_ref = _chain_ref(flows, masks, x, nt)
    z_k, ld_k = chain(params_chain, x)
    np.testing.assert_allclose(np.asarray(z_k), np.asarray(z_ref), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld_k), np.asarray(ld_ref), rtol=1e-6, atol=1e-6)


def test_chain_gradient_parity(chain_setup):
    """Gradients w.r.t. input AND the two underlying flows (incl. the
    reuse-summed cotangents for the repeated last flow) must match XLA."""
    flows, masks, chain, params_chain, x, nt = chain_setup

    def loss_ref(fl, x):
        z, ld = _chain_ref(fl, masks, x, nt)
        # weight every transition differently so dz/dld per transition differ
        w = jnp.arange(1.0, nt + 1)[:, None, None]
        return jnp.sum(jnp.sin(z) * w) + jnp.sum(ld * jnp.arange(1.0, nt + 1)[:, None])

    def loss_k(fl, x):
        pc = [fl[min(t, len(fl) - 1)] for t in range(nt)]
        z, ld = chain(pc, x)
        w = jnp.arange(1.0, nt + 1)[:, None, None]
        return jnp.sum(jnp.sin(z) * w) + jnp.sum(ld * jnp.arange(1.0, nt + 1)[:, None])

    gr_f, gr_x = jax.grad(loss_ref, argnums=(0, 1))(flows, x)
    gk_f, gk_x = jax.grad(loss_k, argnums=(0, 1))(flows, x)
    # 4 chained transitions amplify gradients to ~1e7; f32 reduction-order
    # noise then lands on near-zero elements (cancellation), so tolerance is
    # scaled per leaf by its own magnitude (same scheme as the DP-parity test)
    def close(a, b):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1e-3, float(np.abs(a).max()))
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6 * scale)

    close(gr_x, gk_x)
    for a, b in zip(jax.tree_util.tree_leaves(gr_f), jax.tree_util.tree_leaves(gk_f)):
        close(a, b)


def test_chain_single_transition(chain_setup):
    from rlvae_tpu.ops.iaf_kernels import get_fused_iaf_chain

    flows, masks, *_ = chain_setup
    chain1 = get_fused_iaf_chain(D, H, NB, NH, 1, interpret=True)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(3, D)).astype(np.float32))
    z_k, ld_k = chain1([flows[0]], x)
    y_ref, ld_ref = iaf_forward(flows[0], masks, x)
    np.testing.assert_allclose(np.asarray(z_k[0]), np.asarray(y_ref), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld_k[0]), np.asarray(ld_ref), rtol=1e-6, atol=1e-6)


def _chain_loss_pair(chain, flows, masks, x, nt):
    """(loss_ref, loss_kernel) closures weighting transitions differently."""

    def loss_ref(fl, x):
        z, ld = _chain_ref(fl, masks, x, nt)
        w = jnp.arange(1.0, nt + 1)[:, None, None]
        return jnp.sum(jnp.sin(z) * w) + jnp.sum(ld * jnp.arange(1.0, nt + 1)[:, None])

    def loss_k(fl, x):
        pc = [fl[min(t, len(fl) - 1)] for t in range(nt)]
        z, ld = chain(pc, x)
        w = jnp.arange(1.0, nt + 1)[:, None, None]
        return jnp.sum(jnp.sin(z) * w) + jnp.sum(ld * jnp.arange(1.0, nt + 1)[:, None])

    return loss_ref, loss_k


def _assert_grads_close(ga, gb, rtol=1e-5):
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1e-3, float(np.abs(a).max()))
        np.testing.assert_allclose(b, a, rtol=rtol, atol=1e-6 * scale)


def test_adjoint_vs_legacy_backward(chain_setup):
    """The adjoint fixed-point VJP (auto default, D sweeps = exact: the
    adjoint system's operator is strictly triangular, nilpotent index <= D)
    agrees with the legacy per-dim sequential backward (adj_sweeps=0) on
    every gradient; they differ only in f32 reduction order."""
    from rlvae_tpu.ops.iaf_kernels import get_fused_iaf_chain

    flows, masks, _, params_chain, x, nt = chain_setup
    legacy = get_fused_iaf_chain(D, H, NB, NH, nt, interpret=True, adj_sweeps=0)
    adjoint = get_fused_iaf_chain(D, H, NB, NH, nt, interpret=True, adj_sweeps=D)

    _, loss_legacy = _chain_loss_pair(legacy, flows, masks, x, nt)
    _, loss_adj = _chain_loss_pair(adjoint, flows, masks, x, nt)
    gl = jax.grad(loss_legacy, argnums=(0, 1))(flows, x)
    ga = jax.grad(loss_adj, argnums=(0, 1))(flows, x)
    _assert_grads_close(gl, ga)


def test_adjoint_backward_clamped_big_weights(setup):
    """Adjoint exactness does not depend on the flow contracting: with
    30x-scaled output weights (log-sigma pinned at the clamp, an expanding
    map) the adjoint backward still matches XLA autodiff."""
    from rlvae_tpu.ops.iaf_kernels import get_fused_iaf

    params, masks, _, x = setup
    big = [dict(p) for p in params]
    big[0]["w3"] = big[0]["w3"] * 30.0
    fused = get_fused_iaf(D, H, NB, NH, interpret=True, adj_sweeps=D)

    def loss_ref(p, x):
        y, ld = iaf_forward(p, masks, x)
        return jnp.sum(jnp.sin(y)) + 2.0 * jnp.sum(ld)

    def loss_k(p, x):
        y, ld = fused(p, x)
        return jnp.sum(jnp.sin(y)) + 2.0 * jnp.sum(ld)

    ga = jax.grad(loss_ref, argnums=(0, 1))(big, x)
    gb = jax.grad(loss_k, argnums=(0, 1))(big, x)
    _assert_grads_close(ga, gb)


# ---------------------------------------------------------------------------
# Jacobi fixed-point density blocks (fp_iters > 0): K+1 full MADE passes per
# block instead of the D-step sequential scan; bit-exact at K >= D-1
# ---------------------------------------------------------------------------


def test_fixedpoint_xla_exact_at_d_minus_1(setup):
    """Dim i of the Jacobi iterate is exact after i+1 iterations, so
    n_iters = D-1 plus the final self-consistency pass reproduces the
    sequential algorithm bit-for-bit — same total pass count as the scan."""
    from rlvae_tpu.flows.iaf import iaf_forward_fixedpoint

    params, masks, fused, x = setup
    y_ref, ld_ref = iaf_forward(params, masks, x)
    y, ld = iaf_forward_fixedpoint(params, masks, x, n_iters=D - 1)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
    np.testing.assert_array_equal(np.asarray(ld), np.asarray(ld_ref))


def test_fixedpoint_xla_converges_early(setup):
    """Under realistic weights the contraction makes K=8 land within fp32
    noise of the exact inverse, at inputs spanning unit to 1e6 scale."""
    from rlvae_tpu.flows.iaf import iaf_forward_fixedpoint

    params, masks, fused, _ = setup
    rng = np.random.default_rng(7)
    for scale in (1.0, 1e3, 1e6):
        x = jnp.asarray(rng.normal(size=(16, D)).astype(np.float32)) * scale
        y_ref, ld_ref = iaf_forward(params, masks, x)
        y, ld = iaf_forward_fixedpoint(params, masks, x, n_iters=8)
        denom = np.maximum(np.abs(np.asarray(y_ref)), 1.0)
        rel = np.abs(np.asarray(y - y_ref)) / denom
        assert rel.max() < 1e-5, (scale, rel.max())
        np.testing.assert_allclose(
            np.asarray(ld), np.asarray(ld_ref), rtol=1e-5, atol=1e-5
        )


def test_fixedpoint_chain_kernel_parity(chain_setup):
    """The chain kernel with fp_iters = D-1 matches the sequential chain
    bit-for-bit — forward, log-det, and every gradient (the backward kernel
    is shared: its residuals are the block outputs, which are identical)."""
    from rlvae_tpu.ops.iaf_kernels import get_fused_iaf_chain

    flows, masks, _, params_chain, x, nt = chain_setup
    chain_fp = get_fused_iaf_chain(D, H, NB, NH, nt, interpret=True, fp_iters=D - 1)

    z_ref, ld_ref = _chain_ref(flows, masks, x, nt)
    z_k, ld_k = chain_fp(params_chain, x)
    np.testing.assert_allclose(np.asarray(z_k), np.asarray(z_ref), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld_k), np.asarray(ld_ref), rtol=1e-6, atol=1e-6)

    def loss_ref(fl, x):
        z, ld = _chain_ref(fl, masks, x, nt)
        return jnp.sum(jnp.sin(z)) + jnp.sum(ld)

    def loss_k(fl, x):
        pc = [fl[min(t, len(fl) - 1)] for t in range(nt)]
        z, ld = chain_fp(pc, x)
        return jnp.sum(jnp.sin(z)) + jnp.sum(ld)

    gr_f, gr_x = jax.grad(loss_ref, argnums=(0, 1))(flows, x)
    gk_f, gk_x = jax.grad(loss_k, argnums=(0, 1))(flows, x)

    def close(a, b):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1e-3, float(np.abs(a).max()))
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6 * scale)

    close(gr_x, gk_x)
    for a, b in zip(jax.tree_util.tree_leaves(gr_f), jax.tree_util.tree_leaves(gk_f)):
        close(a, b)


def test_fixedpoint_temporal_config_xla_path(chain_setup):
    """apply_temporal_flows honors fixedpoint_iters on the XLA backend and
    matches the default sequential path bit-for-bit at K = D-1."""
    from rlvae_tpu.flows.temporal import TemporalFlowConfig, apply_temporal_flows

    cfg_seq = TemporalFlowConfig(D, 2, H, NB, NH, backend="xla")
    flows = cfg_seq.init(jax.random.PRNGKey(11))
    x = jnp.asarray(np.random.default_rng(11).normal(size=(4, D)).astype(np.float32))
    z_ref, ld_ref = apply_temporal_flows(cfg_seq, flows, x, 5)

    cfg_fp = TemporalFlowConfig(
        D, 2, H, NB, NH, backend="xla", fixedpoint_iters=D - 1
    )
    z_fp, ld_fp = apply_temporal_flows(cfg_fp, flows, x, 5)
    np.testing.assert_array_equal(np.asarray(z_fp), np.asarray(z_ref))
    np.testing.assert_array_equal(np.asarray(ld_fp), np.asarray(ld_ref))


def test_apply_temporal_flows_uses_chain(monkeypatch):
    """With backend=pallas (interpret on CPU), apply_temporal_flows routes
    through the chain kernel and matches the XLA path end-to-end."""
    import rlvae_tpu.ops.iaf_kernels as ik
    from rlvae_tpu.flows.temporal import TemporalFlowConfig, apply_temporal_flows

    monkeypatch.setattr(ik, "CHAIN_MIN_BATCH", 1)  # pin: route via the chain

    cfg_x = TemporalFlowConfig(D, 2, H, NB, NH, backend="xla")
    flows = cfg_x.init(jax.random.PRNGKey(4))
    x = jnp.asarray(np.random.default_rng(4).normal(size=(3, D)).astype(np.float32))
    z_ref, ld_ref = apply_temporal_flows(cfg_x, flows, x, 5)

    cfg_p = TemporalFlowConfig(D, 2, H, NB, NH, backend="pallas")
    z_k, ld_k = apply_temporal_flows(cfg_p, flows, x, 5)
    np.testing.assert_allclose(np.asarray(z_k), np.asarray(z_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_k), np.asarray(ld_ref), rtol=1e-5, atol=1e-5)


def test_chain_multi_tile_parity(monkeypatch):
    """Batches beyond one tile: the 2-D grid (tiles x transitions) must match
    XLA exactly, including the per-tile weight-grad partial summation.  Tiles
    are forced tiny so a B=20 batch spans 3 tiles in interpret mode."""
    import rlvae_tpu.ops.iaf_kernels as ik

    monkeypatch.setattr(ik, "_tile", lambda b: (8, ((b + 7) // 8) * 8))
    masks = iaf_masks(D, H, NH)
    flows = [init_iaf(jax.random.PRNGKey(9), D, H, NB, NH)]
    nt = 2
    # fresh cache entry (interpret explicitly, distinct nt from other tests'
    # cached closures is not guaranteed -> clear the cache to re-trace under
    # the patched _tile)
    ik._build_fused_iaf_chain.cache_clear()
    chain = ik.get_fused_iaf_chain(D, H, NB, NH, nt, interpret=True)
    pc = [flows[0], flows[0]]
    x = jnp.asarray(np.random.default_rng(5).normal(size=(20, D)).astype(np.float32))

    z_ref, ld_ref = _chain_ref(flows, masks, x, nt)
    z_k, ld_k = chain(pc, x)
    np.testing.assert_allclose(np.asarray(z_k), np.asarray(z_ref), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld_k), np.asarray(ld_ref), rtol=1e-6, atol=1e-6)

    def loss_ref(fl, x):
        z, ld = _chain_ref(fl, masks, x, nt)
        return jnp.sum(jnp.sin(z)) + jnp.sum(ld)

    def loss_k(fl, x):
        z, ld = chain([fl[0], fl[0]], x)
        return jnp.sum(jnp.sin(z)) + jnp.sum(ld)

    gr_f, gr_x = jax.grad(loss_ref, argnums=(0, 1))(flows, x)
    gk_f, gk_x = jax.grad(loss_k, argnums=(0, 1))(flows, x)

    def close(a, b):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1e-3, float(np.abs(a).max()))
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6 * scale)

    close(gr_x, gk_x)
    for a, b in zip(jax.tree_util.tree_leaves(gr_f), jax.tree_util.tree_leaves(gk_f)):
        close(a, b)
    ik._build_fused_iaf_chain.cache_clear()  # drop the patched-_tile closure
