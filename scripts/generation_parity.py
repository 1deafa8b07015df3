#!/usr/bin/env python
"""Generation-quality parity: official prior chain + decode, ours vs torch.

Round-2 VERDICT item 4: the FID/evaluation machinery existed but no artifact
compared GENERATED SAMPLES between this framework and the torch reference on
shared weights.  This script runs the official RHVAE prior chain (100 MCMC x
15 leapfrog, tempered, centroid starts — pythae
rhvae_sampler.py:98-148 / rhvae_sampler_config.py:24-27) in BOTH frameworks
on the same pretrained metric, decodes each sample set with the SAME decoder
weights (the repo's pretrained npz, transplanted into the torch
Decoder_AE_MLP), and compares:

- Fréchet distance between the two sample sets in pixel space and in the
  trained-encoder feature space (utils/fid.py, exact eigh sqrtm), against
  the sampling-noise floor (two independent torch seeds) and a scale
  reference (decoded N(0, 4I) latents),
- chain statistics: mean accept rate and mean final log pi = log sqrt det
  G^{-1}(z).

Writes outputs/generation_parity/summary.json;
tests/test_generation_parity.py gates the committed artifact.

Usage: python scripts/generation_parity.py [--n 256]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

MCMC_STEPS = 100
N_LF = 15


def torch_chain(metric, n_chains, seed):
    """Batched torch HMC prior chain with pythae's own log-density/gradient
    static methods (rhvae_sampler.py:98-148 math; our loop)."""
    import torch

    from tests.reference_utils import TorchMetricModel, import_pythae

    import_pythae()
    from pythae.samplers.manifold_sampler.rhvae_sampler import RHVAESampler

    model = TorchMetricModel(
        np.asarray(metric.centroids), np.asarray(metric.matrices),
        float(metric.temperature), float(metric.regularization),
    )
    torch.manual_seed(seed)
    eps_lf, beta_zero_sqrt = 0.03, 1.0
    idx = np.random.default_rng(seed).integers(0, metric.n_centroids, size=n_chains)
    z = torch.as_tensor(np.asarray(metric.centroids)[idx]).clone()

    def tempering(k, big_k):
        beta_k = ((1.0 - 1.0 / beta_zero_sqrt) * (k / big_k) ** 2) + 1.0 / beta_zero_sqrt
        return 1.0 / beta_k

    accepts = []
    with torch.no_grad():
        for _ in range(MCMC_STEPS):
            gamma = torch.randn_like(z)
            rho = gamma / beta_zero_sqrt
            logpi0 = RHVAESampler.log_sqrt_det_G_inv(z, model).reshape(-1)
            h0 = -logpi0 + 0.5 * (rho**2).sum(-1)
            z_new, rho_new, beta_old = z, rho, beta_zero_sqrt
            for k in range(N_LF):
                g = -RHVAESampler.grad_log_sqrt_det_G_inv(z_new, model).reshape(z.shape)
                rho_half = rho_new - (eps_lf / 2) * g
                z_new = z_new + eps_lf * rho_half
                g = -RHVAESampler.grad_log_sqrt_det_G_inv(z_new, model).reshape(z.shape)
                rho_new = rho_half - (eps_lf / 2) * g
                beta_sqrt = tempering(k + 1, N_LF)
                rho_new = (beta_old / beta_sqrt) * rho_new
                beta_old = beta_sqrt
            logpi = RHVAESampler.log_sqrt_det_G_inv(z_new, model).reshape(-1)
            h = -logpi + 0.5 * (rho_new**2).sum(-1)
            accept = torch.rand(z.shape[0]) < torch.exp(h0 - h)
            accepts.append(float(accept.float().mean()))
            z = torch.where(accept[:, None], z_new, z)
    logpi_final = RHVAESampler.log_sqrt_det_G_inv(z, model).reshape(-1)
    return (
        z.numpy(),
        {"accept_rate": float(np.mean(accepts)),
         "log_pi_mean": float(logpi_final.mean())},
    )


def torch_decode(z):
    """Decode with the reference Decoder_AE_MLP carrying the repo's
    pretrained weights (default_architectures.py:168-221)."""
    import torch
    from types import SimpleNamespace

    from scripts.curve_parity_flagship import _load_npz_params
    from tests.reference_utils import import_pythae

    import_pythae()
    from pythae.models.nn.default_architectures import Decoder_AE_MLP

    dec = Decoder_AE_MLP(SimpleNamespace(input_dim=(3, 64, 64), latent_dim=16))
    w = _load_npz_params(ROOT / "data" / "pretrained" / "decoder.npz")
    with torch.no_grad():
        dec.layers[0][0].weight.copy_(torch.as_tensor(w["hidden_0"]["kernel"].T))
        dec.layers[0][0].bias.copy_(torch.as_tensor(w["hidden_0"]["bias"]))
        dec.layers[1][0].weight.copy_(torch.as_tensor(w["out"]["kernel"].T))
        dec.layers[1][0].bias.copy_(torch.as_tensor(w["out"]["bias"]))
        out = dec(torch.as_tensor(np.asarray(z, np.float32))).reconstruction
    return out.numpy()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--out", default=str(ROOT / "outputs" / "generation_parity"))
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from rlvae_tpu.geometry import load_metric
    from rlvae_tpu.models import RlVAE
    from rlvae_tpu.samplers import HMCConfig, sample_prior_hmc
    from rlvae_tpu.utils.fid import encoder_features, fid_score, pixel_features

    metric = load_metric(ROOT / "data" / "pretrained" / "metric.npz")

    # -- ours: official chain + decode (shared weights) ----------------------
    t0 = time.time()
    cfg = HMCConfig(mcmc_steps=MCMC_STEPS, n_lf=N_LF, init="centroids")
    z_ours, diag_ours = jax.jit(
        lambda k: sample_prior_hmc(metric, k, args.n, cfg, return_diagnostics=True)
    )(jax.random.PRNGKey(0))
    model = RlVAE(
        input_dim=(3, 64, 64), latent_dim=16, n_flows=0,
        posterior_type="gaussian", sampling_method="standard", use_riemannian=False,
        encoder_config={"dtype": "float32"}, decoder_config={"dtype": "float32"},
    )
    variables = model.init(jax.random.PRNGKey(1))
    variables = model.load_pretrained_components(
        variables,
        encoder_path=ROOT / "data" / "pretrained" / "encoder.npz",
        decoder_path=ROOT / "data" / "pretrained" / "decoder.npz",
    )
    dec_out, _ = model.decode(variables, jnp.asarray(z_ours))
    x_ours = np.asarray(dec_out.reconstruction)
    ours_stats = {
        "accept_rate": float(diag_ours["accept_rate"]),
        "log_pi_mean": float(jnp.mean(diag_ours["log_pi"])),
    }
    print(f"ours: {time.time()-t0:.1f}s accept={ours_stats['accept_rate']:.3f} "
          f"log_pi={ours_stats['log_pi_mean']:.3f}", file=sys.stderr)

    # -- torch: same chain math, two seeds (parity target + noise floor) ------
    t0 = time.time()
    z_t0, stats_t0 = torch_chain(metric, args.n, seed=101)
    z_t1, stats_t1 = torch_chain(metric, args.n, seed=202)
    x_t0, x_t1 = torch_decode(z_t0), torch_decode(z_t1)
    print(f"torch chains: {time.time()-t0:.1f}s accept={stats_t0['accept_rate']:.3f} "
          f"log_pi={stats_t0['log_pi_mean']:.3f}", file=sys.stderr)

    # -- scale reference: decoded wide-Gaussian latents ----------------------
    z_rand = 2.0 * np.random.default_rng(3).standard_normal((args.n, 16)).astype(np.float32)
    x_rand = torch_decode(z_rand)

    def enc(x):
        out, _ = model.encode(variables, jnp.asarray(x))
        return np.asarray(out.embedding)

    fd = {
        "pixel_ours_vs_torch": fid_score(pixel_features(x_t0), pixel_features(x_ours)),
        "pixel_torch_seed_floor": fid_score(pixel_features(x_t0), pixel_features(x_t1)),
        "pixel_torch_vs_random_latents": fid_score(pixel_features(x_t0), pixel_features(x_rand)),
        "encoder_ours_vs_torch": fid_score(
            encoder_features(enc, x_t0), encoder_features(enc, x_ours)
        ),
        "encoder_torch_seed_floor": fid_score(
            encoder_features(enc, x_t0), encoder_features(enc, x_t1)
        ),
        "encoder_torch_vs_random_latents": fid_score(
            encoder_features(enc, x_t0), encoder_features(enc, x_rand)
        ),
    }
    import subprocess

    try:
        commit = subprocess.run(
            ["git", "-C", str(ROOT), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        commit = "unknown"
    summary = {
        "n_samples": args.n,
        # provenance: which code produced this artifact (the gating test is
        # an artifact gate, not a live regression gate — regenerate with
        # this script after touching the chain/decoder math)
        "generated_at_commit": commit,
        "chain": {"mcmc_steps": MCMC_STEPS, "n_lf": N_LF, "init": "centroids"},
        "frechet": {k: float(v) for k, v in fd.items()},
        "chain_stats": {"ours": ours_stats, "torch_seed0": stats_t0,
                        "torch_seed1": stats_t1},
    }
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
