"""GP-VAE — Gaussian-process prior VAE for longitudinal sequences.

TPU-native reimplementation of the vendored pythae GPVAE fork (reference:
src/lib/src/pythae/models/gp_vae/gpvae_model.py:16-401): a GP prior over the
time axis per latent dimension (cauchy / rbf / diffusion / matern kernels,
multi-scale tiling), a structured posterior with banded (upper-bidiagonal)
Cholesky precision over time, the explicit multivariate-normal KL, masked
longitudinal reconstruction, and prior-sampled generation.

Shape conventions: the encoder runs per frame and emits 3*latent_dim values
per frame — mean [L], precision diagonal [L], precision superdiagonal [L] —
which is the original GP-VAE parameterization the fork's single-reshape
encoder assumes (gpvae_model.py:154-183; its arithmetic only closes under
exactly this 3L split).

All time-axis linear algebra is [*, T, T] with T=8-scale matrices; solves go
through triangular substitutions on the Cholesky factors (fp32)."""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlvae_tpu.nets import create_decoder, create_encoder
from rlvae_tpu.utils.output import ModelOutput

Array = jax.Array

KERNELS = ("cauchy", "rbf", "diffusion", "matern")


def gp_kernel(
    kind: str, t: int, length_scale: float, sigma: float = 1.0
) -> np.ndarray:
    """Time-axis kernel matrices (reference: gpvae_model.py:258-297)."""
    xs = np.arange(1, t + 1, dtype=np.float64)
    d2 = (xs[None, :] - xs[:, None]) ** 2
    if kind == "cauchy":
        k = sigma / (d2 / length_scale**2 + 1.0) + 1e-3 * np.eye(t)
    elif kind == "rbf":
        k = np.exp(-d2 / length_scale**2)
    elif kind == "diffusion":
        assert length_scale < 0.5, "length_scale must be < 0.5 for diagonal dominance"
        tri = np.triu(np.ones((t, t)), -1)
        k = (tri * tri.T) * length_scale + np.eye(t) * (1.0 - length_scale)
    elif kind == "matern":
        k = np.exp(-np.abs(xs[None, :] - xs[:, None]) / math.sqrt(length_scale))
    else:
        raise ValueError(f"kernel must be one of {KERNELS}")
    return k.astype(np.float32)


class GPVAE:
    def __init__(
        self,
        input_dim: Tuple[int, ...] = (3, 64, 64),
        latent_dim: int = 16,
        time_length: int = 8,
        kernel_choice: str = "cauchy",
        kernel_scales: int = 1,
        length_scale: float = 1.0,
        sigma: float = 1.0,
        beta: float = 1.0,
        reconstruction_loss: str = "mse",
        encoder_config: Optional[Mapping[str, Any]] = None,
        decoder_config: Optional[Mapping[str, Any]] = None,
    ):
        if kernel_choice not in KERNELS:
            raise ValueError(f"kernel must be one of {KERNELS}")
        self.input_dim = tuple(input_dim)
        self.latent_dim = latent_dim
        self.time_length = time_length
        self.beta = float(beta)
        self.reconstruction_loss = reconstruction_loss
        # per-frame encoder emitting (mu, prec_diag, prec_offdiag) per latent
        self.encoder = create_encoder(self.input_dim, 3 * latent_dim, encoder_config)
        self.decoder = create_decoder(self.input_dim, latent_dim, decoder_config)

        # multi-scale kernel tiling across latent dims (gpvae_model.py:225-256)
        mats, total = [], 0
        for i in range(kernel_scales):
            k = gp_kernel(kernel_choice, time_length, length_scale / 2**i, sigma)
            if i == kernel_scales - 1:
                mult = latent_dim - total
            else:
                mult = int(np.ceil(latent_dim / kernel_scales))
                total += mult
            mats.append(np.tile(k[None], (mult, 1, 1)))
        self.prior_cov = jnp.asarray(np.concatenate(mats))  # [L, T, T]
        self.prior_chol = jnp.linalg.cholesky(self.prior_cov)
        self.prior_cov_inv = jnp.linalg.inv(self.prior_cov)
        self.prior_logdet = jnp.linalg.slogdet(self.prior_cov)[1]  # [L]

    def init(self, key: Array) -> Dict[str, Any]:
        k_e, k_d = jax.random.split(key)
        x0 = jnp.zeros((2, *self.input_dim), jnp.float32)
        z0 = jnp.zeros((2, self.latent_dim), jnp.float32)
        return {
            "params": {
                "encoder": dict(self.encoder.init(k_e, x0))["params"],
                "decoder": dict(self.decoder.init(k_d, z0))["params"],
            }
        }

    # -- structured posterior ---------------------------------------------------

    def posterior(self, params, x_flat: Array, b: int):
        """Returns (mu [B,L,T], cov_tril_T [B,L,T,T]) with
        cov = cov_tril_T @ cov_tril_T^T (banded-precision construction,
        reference: gpvae_model.py:154-183)."""
        t, l = self.time_length, self.latent_dim
        enc = self.encoder.apply({"params": params["encoder"]}, x_flat)
        # embedding carries [mu, prec-diag]; log_covariance's first L values
        # carry the prec-superdiagonal (the 3L-per-frame parameterization)
        mu = enc.embedding[:, :l].reshape(b, t, l).transpose(0, 2, 1)  # [B,L,T]
        diag = jax.nn.softplus(enc.embedding[:, l : 2 * l]).reshape(b, t, l)
        off = jax.nn.softplus(enc.log_covariance[:, :l]).reshape(b, t, l)
        return mu, self._posterior_from_stats(diag, off)

    def _posterior_from_stats(self, diag: Array, off: Array) -> Array:
        """inv_p [B,L,T,T] from per-frame precision stats [B,T,L] (already
        softplus'd), via the banded construction (gpvae_model.py:154-183)."""
        b, t, l = diag.shape
        # upper-bidiagonal precision cholesky P + I (rows = time)
        eye = jnp.eye(t, dtype=jnp.float32)
        prec = (
            jax.vmap(jnp.diag)(diag.transpose(0, 2, 1).reshape(b * l, t)).reshape(b, l, t, t)
            + jnp.pad(
                jax.vmap(jnp.diag)(off.transpose(0, 2, 1)[..., : t - 1].reshape(b * l, t - 1)).reshape(
                    b, l, t - 1, t - 1
                ),
                ((0, 0), (0, 0), (0, 1), (1, 0)),
            )
            + eye
        )
        # cov_tril = P^{-1} (upper triangular); z = mu + P^{-T} eps gives
        # cov = (P P^T)^{-1}
        inv_p = jax.vmap(lambda m: jax.scipy.linalg.solve_triangular(m, eye, lower=False))(
            prec.reshape(b * l, t, t)
        ).reshape(b, l, t, t)
        return inv_p

    # -- forward ------------------------------------------------------------------

    def forward(
        self,
        variables: Dict[str, Any],
        x: Array,
        key: Array,
        train: bool = False,
        seq_mask: Optional[Array] = None,
        pix_mask: Optional[Array] = None,
    ) -> ModelOutput:
        params = variables["params"]
        b, t = x.shape[0], x.shape[1]
        assert t == self.time_length
        seq_mask = jnp.ones((b, t), x.dtype) if seq_mask is None else seq_mask
        pix_mask = jnp.ones_like(x) if pix_mask is None else pix_mask
        x = x * pix_mask * seq_mask[:, :, None, None, None]
        x_flat = x.reshape(b * t, *self.input_dim)

        mu, inv_p = self.posterior(params, x_flat, b)  # [B,L,T], [B,L,T,T]
        eps = jax.random.normal(key, mu.shape)
        z = mu + jnp.einsum("bltu,blu->blt", jnp.swapaxes(inv_p, -1, -2), eps)
        z_frames = z.transpose(0, 2, 1).reshape(b * t, self.latent_dim)
        recon = self.decoder.apply({"params": params["decoder"]}, z_frames).reconstruction

        rf = recon.reshape(b * t, -1)
        xf = x_flat.reshape(b * t, -1)
        mf = pix_mask.reshape(b * t, -1)
        if self.reconstruction_loss == "bce":
            # fp32 before the clip: bf16 rounds 1-1e-7 to exactly 1.0 -> log(0)
            e = 1e-7
            r = jnp.clip(rf.astype(jnp.float32), e, 1 - e)
            per_frame = jnp.sum(-(xf * jnp.log(r) + (1 - xf) * jnp.log(1 - r)) * mf, -1)
        else:
            per_frame = jnp.sum(0.5 * (rf - xf) ** 2 * mf, -1)
        recon_loss = jnp.sum(per_frame.reshape(b, t) * seq_mask, axis=-1)

        kld = self._kl_to_prior(mu, inv_p)  # [B]
        loss = jnp.mean(recon_loss) + self.beta * jnp.mean(kld)
        return ModelOutput(
            loss=loss,
            recon_loss=jnp.mean(recon_loss),
            mmd_loss=jnp.mean(kld),  # the fork's (misnamed) KL slot
            recon_x=recon.reshape(x.shape),
            z=z,
        )

    __call__ = forward

    def _kl_to_prior(self, mu: Array, inv_p: Array) -> Array:
        """KL( N(mu, (PP^T)^{-1}) || N(0, K) ) summed over latent dims, [B]
        (reference: gpvae_model.py:185-223 explicit MVN KL)."""
        b, l, t = mu.shape
        cov_q = jnp.einsum("bltu,blvu->bltv", jnp.swapaxes(inv_p, -1, -2), jnp.swapaxes(inv_p, -1, -2))
        k_inv = self.prior_cov_inv[None]  # [1,L,T,T]
        trace = jnp.einsum("bltu,blut->bl", jnp.broadcast_to(k_inv, cov_q.shape), cov_q)
        quad = jnp.einsum("blt,bltu,blu->bl", mu, jnp.broadcast_to(k_inv, cov_q.shape), mu)
        # logdet Sigma_q = -2 sum log diag(P)
        diag_p = jnp.diagonal(inv_p, axis1=-2, axis2=-1)
        logdet_q = 2.0 * jnp.sum(jnp.log(jnp.abs(diag_p)), axis=-1)  # [B,L]
        kl = 0.5 * (trace + quad - t + self.prior_logdet[None] - logdet_q)
        return jnp.sum(kl, axis=-1)

    # -- generation ----------------------------------------------------------------

    def generate(self, variables: Dict[str, Any], key: Array, n: int) -> Array:
        """Sample GP-prior trajectories and decode (gpvae_model.py:379-401)."""
        params = variables["params"]
        eps = jax.random.normal(key, (n, self.latent_dim, self.time_length))
        z = jnp.einsum("ltu,blu->blt", self.prior_chol, eps)
        frames = z.transpose(0, 2, 1).reshape(n * self.time_length, self.latent_dim)
        recon = self.decoder.apply({"params": params["decoder"]}, frames).reconstruction
        return recon.reshape(n, self.time_length, *self.input_dim)
