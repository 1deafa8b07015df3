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
