"""Torch-checkpoint interop + inference API tests.

The strongest interop check creates a real pythae Encoder_VAE_MLP /
Decoder_AE_MLP with torch, converts the state dicts, loads them into the
flax model, and requires identical outputs (reference:
default_architectures.py:60-221, encoder_manager.py:260-326)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlvae_tpu.inference import ModelManager, slerp
from rlvae_tpu.models import RlVAE

DATA = Path(__file__).resolve().parents[1] / "data" / "pretrained"


@pytest.fixture(scope="module")
def torch_components(tmp_path_factory, reference_available):
    if not reference_available:
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    from types import SimpleNamespace

    from tests.reference_utils import import_pythae

    import_pythae()
    from pythae.models.nn.default_architectures import Decoder_AE_MLP, Encoder_VAE_MLP

    torch.manual_seed(0)
    args = SimpleNamespace(input_dim=(3, 8, 8), latent_dim=16)
    enc, dec = Encoder_VAE_MLP(args), Decoder_AE_MLP(args)
    enc.eval(), dec.eval()
    d = tmp_path_factory.mktemp("components")
    torch.save(enc.state_dict(), d / "encoder.pt")
    torch.save(dec.state_dict(), d / "decoder.pt")
    return enc, dec, d


def test_torch_component_parity(torch_components):
    import torch

    enc_t, dec_t, d = torch_components
    model = RlVAE(
        input_dim=(3, 8, 8), latent_dim=16, n_flows=0,
        posterior_type="gaussian", sampling_method="standard", use_riemannian=False,
    )
    variables = model.init(jax.random.PRNGKey(0))
    variables = model.load_pretrained_components(
        variables, encoder_path=d / "encoder.pt", decoder_path=d / "decoder.pt"
    )

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(4, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = enc_t(torch.as_tensor(x))
    out, _ = model.encode(variables, jnp.asarray(x))
    # the flax nets run bf16 activations by design (fp32 params), so parity
    # with torch fp32 holds to bf16 resolution (~4e-3 at O(1) magnitudes)
    np.testing.assert_allclose(np.asarray(out.embedding), ref.embedding.numpy(), atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(out.log_covariance), ref.log_covariance.numpy(), atol=5e-3
    )

    z = rng.normal(size=(4, 16)).astype(np.float32)
    with torch.no_grad():
        ref_rec = dec_t(torch.as_tensor(z)).reconstruction.numpy()
    dec_out, _ = model.decode(variables, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(dec_out.reconstruction), ref_rec, atol=5e-3)


def test_factory_wires_pretrained_components(torch_components):
    """create_model -> init() must start from the configured pretrained
    encoder/decoder weights, not a random init (reference:
    riemannian_flow_vae.py:921-942 via the hydra pretrained node)."""
    from rlvae_tpu.models.factory import create_model

    _, _, d = torch_components
    cfg = {
        "input_dim": [3, 8, 8], "latent_dim": 16, "n_flows": 0,
        "posterior": {"type": "gaussian"},
        "sampling": {"method": "standard", "use_riemannian": False},
        "pretrained": {
            "encoder_path": str(d / "encoder.pt"),
            "decoder_path": str(d / "decoder.pt"),
        },
    }
    model = create_model(cfg)
    variables = model.init(jax.random.PRNGKey(0))

    plain = RlVAE(input_dim=(3, 8, 8), latent_dim=16, n_flows=0,
                  posterior_type="gaussian", use_riemannian=False)
    expected = plain.load_pretrained_components(
        plain.init(jax.random.PRNGKey(0)),
        encoder_path=d / "encoder.pt", decoder_path=d / "decoder.pt",
    )
    for which in ("encoder", "decoder"):
        got = jax.tree_util.tree_leaves(variables["params"][which])
        want = jax.tree_util.tree_leaves(expected["params"][which])
        for x, y in zip(got, want):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # configured-but-missing paths warn and fall back to random init
    cfg_missing = {**cfg, "pretrained": {"encoder_path": str(d / "nope.pt")}}
    model2 = create_model(cfg_missing)
    assert model2.pretrained_encoder_path is None
    model2.init(jax.random.PRNGKey(0))


def test_component_shape_mismatch_rejected(torch_components):
    _, _, d = torch_components
    model = RlVAE(input_dim=(3, 16, 16), latent_dim=16, n_flows=0,
                  posterior_type="gaussian", use_riemannian=False)
    variables = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="shapes"):
        model.load_pretrained_components(variables, encoder_path=d / "encoder.pt")


# -- inference API ----------------------------------------------------------


@pytest.fixture(scope="module")
def manager():
    cfg = {
        "input_dim": [3, 8, 8], "latent_dim": 16, "n_flows": 2,
        "flow_hidden_size": 16,
        "posterior": {"type": "riemannian_metric"},
        "sampling": {"method": "geodesic", "use_riemannian": True},
        "pretrained": {"metric_path": str(DATA / "metric_T0.7_scaled.npz")},
        "metric": {"temperature_override": 3.0},
    }
    return ModelManager.from_config(cfg)


def test_manager_roundtrip(manager):
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, 4, 3, 8, 8)).astype(np.float32)
    recon = manager.reconstruct(x)
    assert recon.shape == x.shape
    z = manager.embed_sequence(x)
    assert z.shape == (2, 4, 16)
    enc = manager.encode(x[:, 0])
    assert enc.embedding.shape == (2, 16)
    dec = manager.decode(np.asarray(enc.embedding))
    assert dec.shape == (2, 3, 8, 8)


def test_manager_sampling(manager):
    x = manager.sample_random(3, n_obs=4)
    assert x.shape == (3, 4, 3, 8, 8)
    z = manager.sample_latent(5, method="centroid_aware")
    assert z.shape == (5, 16)


def test_manager_interpolation(manager):
    rng = np.random.default_rng(1)
    x1, x2 = rng.uniform(size=(2, 3, 8, 8)).astype(np.float32)
    lin = manager.interpolate(x1, x2, n_steps=5, mode="linear")
    sph = manager.interpolate(x1, x2, n_steps=5, mode="spherical")
    assert lin.shape == (5, 3, 8, 8) and sph.shape == (5, 3, 8, 8)
    assert not np.allclose(lin[2], sph[2])  # paths genuinely differ


def test_slerp_endpoints():
    z1 = jnp.asarray([1.0, 0.0])
    z2 = jnp.asarray([0.0, 1.0])
    np.testing.assert_allclose(np.asarray(slerp(0.0, z1, z2)), np.asarray(z1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(slerp(1.0, z1, z2)), np.asarray(z2), atol=1e-5)
    mid = np.asarray(slerp(0.5, z1, z2))
    np.testing.assert_allclose(np.linalg.norm(mid), 1.0, atol=1e-5)


def test_checkpoint_manager_roundtrip(tmp_path):
    """from_checkpoint loads a Trainer-saved state."""
    from rlvae_tpu.train import CheckpointManager

    cfg = {
        "input_dim": [3, 8, 8], "latent_dim": 8, "n_flows": 0,
        "posterior": {"type": "gaussian"}, "sampling": {"method": "standard"},
    }
    mm = ModelManager.from_config(cfg)
    ckpt = CheckpointManager(tmp_path / "checkpoints")
    ckpt.save("best", {"variables": mm.variables, "step": 0, "val_loss": 1.0})
    ckpt.wait()  # saves are async; flush before readers with other handles
    mm2 = ModelManager.from_checkpoint(tmp_path, cfg)
    a = jax.tree_util.tree_leaves(mm.variables["params"])
    b = jax.tree_util.tree_leaves(mm2.variables["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_svae_encoder_and_discriminator_torch_parity(reference_available):
    """Value parity for the two remaining default-architecture nets:
    Encoder_SVAE_MLP (embedding + log_concentration head,
    default_architectures.py:119-167) and Discriminator_MLP
    (flatten -> 256 -> ReLU -> 1 -> sigmoid, :265-331), with converted
    torch weights."""
    if not reference_available:
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    from types import SimpleNamespace

    from tests.reference_utils import import_pythae

    import_pythae()
    from pythae.models.nn.default_architectures import (
        Discriminator_MLP,
        Encoder_SVAE_MLP,
    )

    from rlvae_tpu.nets import DiscriminatorMLP, SVAEEncoderMLP

    torch.manual_seed(0)
    rng = np.random.default_rng(0)

    # -- SVAE encoder
    args = SimpleNamespace(input_dim=(3, 8, 8), latent_dim=16)
    enc_t = Encoder_SVAE_MLP(args)
    enc_t.eval()
    sd = enc_t.state_dict()
    enc_j = SVAEEncoderMLP(input_dim=(3, 8, 8), latent_dim=16)
    x = rng.uniform(size=(4, 3, 8, 8)).astype(np.float32)
    v = enc_j.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {
        "hidden_0": {"kernel": sd["layers.0.0.weight"].numpy().T,
                     "bias": sd["layers.0.0.bias"].numpy()},
        "embedding": {"kernel": sd["embedding.weight"].numpy().T,
                      "bias": sd["embedding.bias"].numpy()},
        "log_concentration": {"kernel": sd["log_concentration.weight"].numpy().T,
                              "bias": sd["log_concentration.bias"].numpy()},
    }
    out = enc_j.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        ref = enc_t(torch.as_tensor(x))
    assert out.embedding.shape == (4, 16) and out.log_concentration.shape == (4, 1)
    np.testing.assert_allclose(np.asarray(out.embedding), ref.embedding.numpy(),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.log_concentration),
                               ref.log_concentration.numpy(), atol=5e-3)

    # -- discriminator
    dargs = SimpleNamespace(discriminator_input_dim=(3, 8, 8))
    dis_t = Discriminator_MLP(dargs)
    dis_t.eval()
    sd = dis_t.state_dict()
    dis_j = DiscriminatorMLP(discriminator_input_dim=(3, 8, 8))
    dis_j.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {
        "hidden_0": {"kernel": sd["layers.0.0.weight"].numpy().T,
                     "bias": sd["layers.0.0.bias"].numpy()},
        "out": {"kernel": sd["layers.1.0.weight"].numpy().T,
                "bias": sd["layers.1.0.bias"].numpy()},
    }
    out = dis_j.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        ref = dis_t(torch.as_tensor(x))
    assert out.embedding.shape == (4, 1)
    np.testing.assert_allclose(np.asarray(out.embedding),
                               ref.embedding.numpy(), atol=5e-3)
