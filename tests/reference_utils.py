"""Helpers for parity tests against the mounted read-only reference checkout.

The reference's vendored pythae fork imports torch + pydantic (available) but
also `sklearn_extra` (not installed); we stub it before adding the vendored
tree to sys.path.  All use is read-only and behind `reference_available`.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"
PYTHAE_PATH = f"{REFERENCE_ROOT}/src/lib/src"


def import_pythae():
    """Make the reference's vendored pythae importable; returns the module."""
    for name in ("sklearn_extra", "sklearn_extra.cluster"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    if not hasattr(sys.modules["sklearn_extra.cluster"], "KMedoids"):
        sys.modules["sklearn_extra.cluster"].KMedoids = object
    if PYTHAE_PATH not in sys.path:
        sys.path.insert(0, PYTHAE_PATH)
    import pythae  # noqa: F401

    return pythae


def import_reference_src():
    """Make the reference's `src` package importable (needs stubs for
    omegaconf, which its component managers import at module level)."""
    import_pythae()
    if "omegaconf" not in sys.modules:
        stub = types.ModuleType("omegaconf")
        stub.DictConfig = dict
        stub.OmegaConf = type("OmegaConf", (), {})
        stub.ListConfig = list
        sys.modules["omegaconf"] = stub
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import src.models  # noqa: F401

    return sys.modules["src.models"]


class TorchMetricModel:
    """Minimal stand-in exposing the attributes pythae's metric closures read
    (M_tens, centroids_tens, temperature, lbd, latent_dim)."""

    def __init__(self, centroids, matrices, temperature, lbd):
        import numpy as np
        import torch

        self.centroids_tens = torch.as_tensor(np.array(centroids))
        self.M_tens = torch.as_tensor(np.array(matrices))
        self.temperature = torch.as_tensor(float(temperature))
        self.lbd = torch.as_tensor(float(lbd))
        self.latent_dim = self.centroids_tens.shape[1]

        from pythae.models.rhvae.rhvae_utils import create_inverse_metric, create_metric

        self.G = create_metric(self)
        self.G_inv = create_inverse_metric(self)


def import_reference_research(module: str):
    """Import one of the reference's 'unimportable' research-model modules
    (riem.riem_model, lvae_gugus.lvaeg_model, ...) by stubbing the three
    unvendored external deps — same treatment as import_reference_lldm.
    riem_model additionally imports through the `lib.src.pythae` namespace
    alias, which resolves once /root/reference/src is on sys.path."""
    import importlib

    import_reference_lldm()  # installs the diffusion/geometric stubs
    src_root = f"{REFERENCE_ROOT}/src"
    if module.startswith("riem") and src_root not in sys.path:
        sys.path.insert(0, src_root)
    return importlib.import_module(f"pythae.models.{module}")


def import_reference_lldm():
    """Import the reference's LLDM module (pythae.models.lldm.lldm_model) by
    stubbing its three unvendored external dependencies
    (lldm_model.py:19-21: diffusion.stable_diffusion.latent_diffusion,
    ...sampler.ddim, geometric_perspective_on_vaes.sampling).  The stubs are
    import-time placeholders only — parity tests construct LLDM with mock
    frozen components and exercise the loss/prior math, which touches none
    of them."""
    import_pythae()
    for name in (
        "diffusion",
        "diffusion.stable_diffusion",
        "diffusion.stable_diffusion.latent_diffusion",
        "diffusion.stable_diffusion.sampler",
        "diffusion.stable_diffusion.sampler.ddim",
        "geometric_perspective_on_vaes",
        "geometric_perspective_on_vaes.sampling",
    ):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["diffusion.stable_diffusion.latent_diffusion"].MyLatentDiffusion = object
    sys.modules["diffusion.stable_diffusion.sampler.ddim"].DDIMSampler = object
    sys.modules["geometric_perspective_on_vaes.sampling"].hmc_sampling = None
    import importlib

    return importlib.import_module("pythae.models.lldm.lldm_model")
