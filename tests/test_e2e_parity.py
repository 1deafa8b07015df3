"""Full-model loss parity against the reference's actual torch model.

Builds the reference RiemannianFlowVAE from the mounted checkout, transfers
its torch weights into our flax/JAX model, pins the stochastic posterior to a
deterministic offset on BOTH sides, and requires every loss component of the
end-to-end forward pass to match (reference: riemannian_flow_vae.py:1093-1246).
This is the ELBO-parity gate from BASELINE.md.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlvae_tpu.models import RlVAE

INPUT_DIM = (3, 8, 8)
LATENT = 16
N_FLOWS = 2
HID = 32


@pytest.fixture(scope="module")
def reference_model(reference_available):
    if not reference_available:
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    from tests.reference_utils import import_reference_src

    import_reference_src()
    from src.models.riemannian_flow_vae import RiemannianFlowVAE

    torch.manual_seed(0)
    model = RiemannianFlowVAE(
        input_dim=INPUT_DIM,
        latent_dim=LATENT,
        n_flows=N_FLOWS,
        flow_hidden_size=HID,
        posterior_type="riemannian_metric",
        riemannian_beta=8.0,
    )
    model.load_pretrained_metrics(
        "/root/reference/data/pretrained/metric_T0.7_scaled.pt", temperature_override=3.0
    )
    model.eval()
    # deterministic posterior: z0 = mu + 0.1 on both frameworks
    model.sample_metric_aware_posterior = lambda mu, log_var: mu + 0.1
    return model


class _DeterministicRlVAE(RlVAE):
    def sample_z0(self, key, mu, log_var):
        return mu + 0.1


def _transfer_weights(ref, ours_vars):
    """Torch state -> our params (encoder/decoder MLP + per-flow MADE blocks)."""
    from tests.test_flows import _torch_iaf_to_params

    def wb(lin):
        return (
            jnp.array(lin.weight.detach().numpy().T),
            jnp.array(lin.bias.detach().numpy()),
        )

    params = jax.tree_util.tree_map(lambda a: a, ours_vars["params"])  # copy
    k0, b0 = wb(ref.encoder.layers[0][0])
    ke, be = wb(ref.encoder.embedding)
    kv, bv = wb(ref.encoder.log_var)
    params["encoder"] = {
        "hidden_0": {"kernel": k0, "bias": b0},
        "embedding": {"kernel": ke, "bias": be},
        "log_var": {"kernel": kv, "bias": bv},
    }
    k0, b0 = wb(ref.decoder.layers[0][0])
    k1, b1 = wb(ref.decoder.layers[1][0])
    params["decoder"] = {
        "hidden_0": {"kernel": k0, "bias": b0},
        "out": {"kernel": k1, "bias": b1},
    }
    params["flows"] = [_torch_iaf_to_params(flow) for flow in ref.flow_manager.flows]
    return {**ours_vars, "params": params}


@pytest.fixture(scope="module")
def our_model(reference_model):
    model = _DeterministicRlVAE(
        input_dim=INPUT_DIM,
        latent_dim=LATENT,
        n_flows=N_FLOWS,
        flow_hidden_size=HID,
        posterior_type="riemannian_metric",
        sampling_method="geodesic",
        riemannian_beta=8.0,
    )
    model.load_pretrained_metric(
        "/root/reference/data/pretrained/metric_T0.7_scaled.pt", temperature_override=3.0
    )
    variables = model.init(jax.random.PRNGKey(0), n_obs=4)
    variables = _transfer_weights(reference_model, variables)
    return model, variables


def test_full_forward_loss_parity(reference_model, our_model):
    import torch

    model, variables = our_model
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(4, 4, *INPUT_DIM)).astype(np.float32)

    with torch.no_grad():
        ref_out = reference_model(torch.as_tensor(x))
    out = model.forward(variables, jnp.asarray(x), jax.random.PRNGKey(0))

    # bf16 activations in our nets -> tolerances at bf16 resolution scaled by
    # the loss magnitudes
    for ours_key, ref_key, tol in (
        ("recon_loss", "recon_loss", 2e-2),
        ("kld_loss", "kld_loss", 2e-2),
        ("flow_loss", "flow_loss", 2e-2),
        ("loss", "loss", 2e-2),
    ):
        a = float(out[ours_key])
        b = float(getattr(ref_out, ref_key))
        assert abs(a - b) / (abs(b) + 1e-3) < tol, f"{ours_key}: ours={a} ref={b}"

    # latent trajectories: the untrained IAF chain amplifies differences
    # exponentially over time (each block applies exp(+-1.5) per dim), so the
    # bf16 encoder delta grows with t — tight parity early, loose late
    z_ours, z_ref = np.asarray(out.z), ref_out.z.numpy()
    np.testing.assert_allclose(z_ours[:, 0], z_ref[:, 0], rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(z_ours[:, 1], z_ref[:, 1], rtol=2e-2, atol=2e-2)
    rel = np.abs(z_ours - z_ref) / (np.abs(z_ref) + 1e-2)
    assert np.median(rel) < 2e-2 and rel.max() < 0.5, (
        f"trajectory divergence: median {np.median(rel):.3g}, max {rel.max():.3g}"
    )


def test_closed_loop_parity(reference_model, our_model):
    import torch

    ref = reference_model
    ref.set_loop_mode("closed", penalty_weight=5.0)
    try:
        model, variables = our_model
        closed = _DeterministicRlVAE(
            input_dim=INPUT_DIM, latent_dim=LATENT, n_flows=N_FLOWS,
            flow_hidden_size=HID, posterior_type="riemannian_metric",
            riemannian_beta=8.0, loop_mode="closed", loop_penalty=5.0,
            metric=model.metric,
        )
        rng = np.random.default_rng(1)
        x = rng.uniform(size=(2, 4, *INPUT_DIM)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.as_tensor(x))
        out = closed.forward(variables, jnp.asarray(x), jax.random.PRNGKey(0))
        # total-loss parity covers the doubled frame-0 reconstruction AND the
        # cycle penalty (the other components are shared with the open test)
        a, b = float(out.loss), float(ref_out.loss)
        assert abs(a - b) / (abs(b) + 1e-3) < 2e-2, f"closed-loop loss: ours={a} ref={b}"
        np.testing.assert_array_equal(
            np.asarray(out.z[:, -1]), np.asarray(out.z[:, 0])
        )
    finally:
        ref.set_loop_mode("open", penalty_weight=1.0)
