"""Flow tests: structural properties + direct torch parity with shared weights.

The strongest check imports the reference's vendored pythae IAF, copies its
torch weights into our param pytree, and requires identical outputs on the
same inputs (reference: pythae iaf_model.py / made_model.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlvae_tpu.flows import (
    TemporalFlowConfig,
    apply_temporal_flows,
    iaf_forward,
    iaf_inverse,
    iaf_masks,
    init_iaf,
    make_degrees,
    make_masks,
)

D, HID, NB, NH = 16, 64, 2, 3


@pytest.fixture(scope="module")
def iaf_setup():
    masks = iaf_masks(D, HID, NH)
    params = init_iaf(jax.random.PRNGKey(0), D, HID, NB, NH)
    return params, masks


def test_mask_autoregressive_property():
    masks = make_masks(D, [HID] * NH)
    # composed connectivity: output d must not depend on inputs >= d
    conn = masks[0]
    for m in masks[1:-1]:
        conn = (conn @ m > 0).astype(np.float32)
    out = (conn @ masks[-1] > 0).astype(np.float32)  # [D_in, 2D_out]
    for head in (out[:, :D], out[:, D:]):
        for j in range(D):
            assert head[j:, j].sum() == 0, f"output {j} depends on input >= {j}"


def test_degrees_match_reference_formula():
    degs = make_degrees(16, [64, 64, 64])
    assert degs[0].tolist() == list(range(1, 17))
    assert degs[1].min() >= 1 and degs[1].max() <= 15


def test_roundtrip(iaf_setup):
    params, masks = iaf_setup
    x = jax.random.normal(jax.random.PRNGKey(1), (8, D))
    y, ld_f = iaf_forward(params, masks, x)
    x_back, ld_i = iaf_inverse(params, masks, y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=1e-5)


def test_jit_grad(iaf_setup):
    params, masks = iaf_setup
    x = jax.random.normal(jax.random.PRNGKey(2), (4, D))

    def loss(p):
        y, ld = iaf_forward(p, masks, x)
        return jnp.sum(y**2) - jnp.mean(ld)

    g = jax.jit(jax.grad(loss))(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(a)).all() for a in flat)
    # masked-out weights must receive zero gradient
    g0 = np.asarray(g[0]["w0"])
    m0 = np.asarray(masks[0])
    assert np.allclose(g0 * (1 - m0), 0.0)


def test_temporal_chain():
    cfg = TemporalFlowConfig(D, n_flows=4, hidden_size=HID, n_blocks=NB, n_hidden=NH)
    flows = cfg.init(jax.random.PRNGKey(3))
    z0 = jax.random.normal(jax.random.PRNGKey(4), (6, D))
    z_seq, lds = apply_temporal_flows(cfg, flows, z0, n_obs=8)
    assert z_seq.shape == (6, 8, D)
    assert lds.shape == (6, 7)
    np.testing.assert_array_equal(np.asarray(z_seq[:, 0]), np.asarray(z0))
    # flows 4..6 reuse the last flow but on different inputs -> different outputs
    assert not np.allclose(np.asarray(z_seq[:, 5]), np.asarray(z_seq[:, 6]))


def test_vanilla_no_flows():
    cfg = TemporalFlowConfig(D, n_flows=0)
    z0 = jnp.ones((2, D))
    z_seq, lds = apply_temporal_flows(cfg, [], z0, n_obs=1)
    assert z_seq.shape == (2, 1, D) and lds.shape == (2, 0)


# ---------------------------------------------------------------------------
# Torch parity with shared weights
# ---------------------------------------------------------------------------


def _torch_iaf_to_params(flow):
    """Convert a reference pythae IAF module's weights into our pytree."""
    blocks = []
    for made in flow.net:
        p = {}
        layers = [made.context_input_layer] + [
            m for m in made.net if m.__class__.__name__ == "MaskedLinear"
        ]
        for li, lin in enumerate(layers):
            p[f"w{li}"] = jnp.array(lin.weight.detach().numpy().T)
            p[f"b{li}"] = jnp.array(lin.bias.detach().numpy())
        blocks.append(p)
    return blocks


def test_torch_parity(reference_available):
    if not reference_available:
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    from tests.reference_utils import import_pythae

    import_pythae()
    from pythae.models.normalizing_flows.iaf import IAF, IAFConfig

    torch.manual_seed(0)
    cfg = IAFConfig(input_dim=(D,), hidden_size=HID, n_blocks=NB)
    ref = IAF(cfg)
    ref.eval()

    params = _torch_iaf_to_params(ref)
    masks = iaf_masks(D, HID, NH)
    # masks must match the reference's exactly
    ref_mask0 = ref.net[0].context_input_layer.mask.numpy().T
    np.testing.assert_array_equal(np.asarray(masks[0]), ref_mask0)

    x = np.random.default_rng(5).normal(size=(8, D)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.as_tensor(x))
    y_ref, ld_ref = out_ref.out.numpy(), out_ref.log_abs_det_jac.numpy()
    y_ours, ld_ours = iaf_forward(params, masks, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_ours), y_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_ours), ld_ref, rtol=1e-4, atol=1e-5)

    with torch.no_grad():
        inv_ref = ref.inverse(torch.as_tensor(y_ref))
    x_ours, ld_inv_ours = iaf_inverse(params, masks, jnp.asarray(y_ref))
    np.testing.assert_allclose(np.asarray(x_ours), inv_ref.out.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ld_inv_ours), inv_ref.log_abs_det_jac.numpy(), rtol=1e-4, atol=1e-5
    )


def test_batchnorm_flow_roundtrip():
    from rlvae_tpu.flows.batchnorm import (
        batchnorm_forward,
        batchnorm_inverse,
        init_batchnorm,
    )

    params, state = init_batchnorm(6)
    params = {k: v + 0.1 for k, v in params.items()}  # non-trivial transform
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 6)) * 2.0 + 1.0

    # eval mode: exact inverse with running stats
    y, ld_f, _ = batchnorm_forward(params, state, x, train=False)
    x_back, ld_i = batchnorm_inverse(params, state, y, train=False)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=1e-5)

    # training mode: running stats move toward batch stats
    y, ld, new_state = batchnorm_forward(params, state, x, train=True)
    assert float(jnp.abs(new_state["running_mean"]).max()) > 0.0
    # normalized output has ~zero mean / unit pre-scale variance
    pre = (y - params["beta"]) * jnp.exp(-params["log_gamma"])
    np.testing.assert_allclose(float(pre.mean()), 0.0, atol=1e-5)
    x_back, _ = batchnorm_inverse(params, new_state, y, train=True)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), rtol=1e-4, atol=1e-4)
