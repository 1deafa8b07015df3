"""VAMP — VAE with a Variational Mixture of Posteriors prior.

TPU-native reimplementation of the vendored pythae VAMP fork (reference:
src/lib/src/pythae/models/vamp/vamp_model.py:15-275): learnable pseudo-inputs
(one Linear ``C -> prod(input_dim)`` + hardtanh to [0,1]), mixture prior
log p(z) = logsumexp_k N(z; mu_k, sigma_k) - log C over the encoded
pseudo-inputs, masked longitudinal reconstruction (the fork's seq/pix masks),
linear KL warmup, and an importance-sampled NLL.

The model is functional: all state in ``variables``; forward is pure/jittable
with a static ``train`` flag (warmup beta is an argument, not hidden state).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlvae_tpu.nets import create_decoder, create_encoder
from rlvae_tpu.utils.output import ModelOutput

Array = jax.Array


class VAMP:
    def __init__(
        self,
        input_dim: Tuple[int, ...] = (3, 64, 64),
        latent_dim: int = 16,
        number_components: int = 50,
        linear_scheduling_steps: int = 0,
        reconstruction_loss: str = "mse",
        encoder_config: Optional[Mapping[str, Any]] = None,
        decoder_config: Optional[Mapping[str, Any]] = None,
    ):
        self.input_dim = tuple(input_dim)
        self.latent_dim = latent_dim
        self.number_components = number_components
        self.linear_scheduling = linear_scheduling_steps
        self.reconstruction_loss = reconstruction_loss
        self.encoder = create_encoder(self.input_dim, latent_dim, encoder_config)
        self.decoder = create_decoder(self.input_dim, latent_dim, decoder_config)

    def init(self, key: Array) -> Dict[str, Any]:
        k_e, k_d, k_p = jax.random.split(key, 3)
        x0 = jnp.zeros((2, *self.input_dim), jnp.float32)
        z0 = jnp.zeros((2, self.latent_dim), jnp.float32)
        c = self.number_components
        d_in = int(np.prod(self.input_dim))
        bound = 1.0 / math.sqrt(c)
        return {
            "params": {
                "encoder": dict(self.encoder.init(k_e, x0))["params"],
                "decoder": dict(self.decoder.init(k_d, z0))["params"],
                # pseudo-input generator (vamp_model.py:53-57): Linear + hardtanh
                "pseudo": {
                    "kernel": jax.random.uniform(k_p, (c, d_in), jnp.float32, -bound, bound),
                    "bias": jnp.zeros((d_in,), jnp.float32),
                },
            }
        }

    # -- pieces ----------------------------------------------------------------

    def pseudo_inputs(self, params) -> Array:
        """[C, *input_dim] in [0, 1] (idle eye input -> Linear -> hardtanh)."""
        p = params["pseudo"]
        flat = jnp.clip(p["kernel"] + p["bias"][None, :], 0.0, 1.0)
        return flat.reshape(self.number_components, *self.input_dim)

    def log_p_z(self, params, z: Array) -> Array:
        """VAMP mixture prior log-density, [B] (vamp_model.py:159-193)."""
        x_pseudo = self.pseudo_inputs(params)
        enc = self.encoder.apply({"params": params["encoder"]}, x_pseudo)
        mu_k, lv_k = enc.embedding, enc.log_covariance  # [C, D]
        comp = jnp.sum(
            -0.5 * (lv_k[None] + (z[:, None, :] - mu_k[None]) ** 2 / jnp.exp(lv_k[None])),
            axis=2,
        ) - jnp.log(float(self.number_components))
        return jax.scipy.special.logsumexp(comp, axis=1)

    def _recon_loss(self, recon: Array, x: Array, pix_mask: Array) -> Array:
        rf = recon.reshape(recon.shape[0], -1)
        xf = x.reshape(x.shape[0], -1)
        mf = pix_mask.reshape(x.shape[0], -1)
        if self.reconstruction_loss == "bce":
            # fp32 before the clip: bf16 rounds 1-1e-7 to exactly 1.0, so a
            # bf16 out_dtype decoder would hit log(0) = -inf (ADVICE r4)
            eps = 1e-7
            r = jnp.clip(rf.astype(jnp.float32), eps, 1 - eps)
            return jnp.sum((-(xf * jnp.log(r) + (1 - xf) * jnp.log(1 - r))) * mf, axis=-1)
        return jnp.sum(0.5 * (rf - xf) ** 2 * mf, axis=-1)

    # -- forward ---------------------------------------------------------------

    def forward(
        self,
        variables: Dict[str, Any],
        x: Array,
        key: Array,
        epoch: int = 100,
        train: bool = False,
        seq_mask: Optional[Array] = None,
        pix_mask: Optional[Array] = None,
        eps: Optional[Array] = None,
    ) -> ModelOutput:
        """x: [B, T, C, H, W] longitudinal batch (the fork's convention);
        frames are modeled independently under the VAMP prior.  ``eps``
        overrides the reparameterization noise (parity tests)."""
        params = variables["params"]
        b, t = x.shape[0], x.shape[1]
        seq_mask = jnp.ones((b, t), x.dtype) if seq_mask is None else seq_mask
        pix_mask = jnp.ones_like(x) if pix_mask is None else pix_mask
        x = x * pix_mask * seq_mask[:, :, None, None, None]
        x_flat = x.reshape(b * t, *self.input_dim)

        enc = self.encoder.apply({"params": params["encoder"]}, x_flat)
        mu, log_var = enc.embedding, enc.log_covariance
        if eps is None:
            eps = jax.random.normal(key, mu.shape)
        z = mu + eps * jnp.exp(0.5 * log_var)
        recon = self.decoder.apply({"params": params["decoder"]}, z).reconstruction

        recon_loss = self._recon_loss(
            recon, x_flat, pix_mask.reshape(b * t, *self.input_dim)
        )
        log_p_z = self.log_p_z(params, z)
        log_q_z = jnp.sum(-0.5 * (log_var + (z - mu) ** 2 / jnp.exp(log_var)), axis=1)
        kld = -(log_p_z - log_q_z)

        # linear KL warmup (vamp_model.py:145-151); eval pins beta = 1
        if self.linear_scheduling > 0 and train:
            beta = jnp.minimum(1.0 * epoch / self.linear_scheduling, 1.0)
        else:
            beta = 1.0
        loss = jnp.mean(recon_loss + beta * kld)
        return ModelOutput(
            loss=loss,
            reconstruction_loss=jnp.mean(recon_loss),
            reg_loss=jnp.mean(kld),
            recon_x=recon.reshape(x.shape),
            z=z,
            mu=mu,
            log_var=log_var,
        )

    __call__ = forward

    # -- generation / evaluation ------------------------------------------------

    def generate(self, variables: Dict[str, Any], key: Array, n: int) -> Array:
        """Sample the VAMP prior (pick a pseudo-component, then its Gaussian)
        and decode."""
        params = variables["params"]
        k_c, k_e = jax.random.split(key)
        x_pseudo = self.pseudo_inputs(params)
        enc = self.encoder.apply({"params": params["encoder"]}, x_pseudo)
        idx = jax.random.randint(k_c, (n,), 0, self.number_components)
        mu_k = enc.embedding[idx]
        std_k = jnp.exp(0.5 * enc.log_covariance[idx])
        z = mu_k + std_k * jax.random.normal(k_e, mu_k.shape)
        return self.decoder.apply({"params": params["decoder"]}, z).reconstruction

    def estimate_nll(
        self, variables: Dict[str, Any], x: Array, key: Array, n_samples: int = 50
    ) -> Array:
        """Importance-sampled NLL per frame, [B*T] (vamp_model.py:201-275)."""
        params = variables["params"]
        x_flat = x.reshape(-1, *self.input_dim)
        enc = self.encoder.apply({"params": params["encoder"]}, x_flat)
        mu, log_var = enc.embedding, enc.log_covariance
        std = jnp.exp(0.5 * log_var)
        d_x = int(np.prod(self.input_dim))

        def one(k):
            eps = jax.random.normal(k, mu.shape)
            z = mu + eps * std
            recon = self.decoder.apply({"params": params["decoder"]}, z).reconstruction
            log_pxz = -0.5 * jnp.sum(
                (recon.reshape(z.shape[0], -1) - x_flat.reshape(z.shape[0], -1)) ** 2,
                axis=-1,
            ) - d_x / 2 * math.log(2 * math.pi)
            log_pz = self.log_p_z(params, z)
            log_qz = jnp.sum(-0.5 * (log_var + (z - mu) ** 2 / jnp.exp(log_var)), axis=1)
            return log_pxz + log_pz - log_qz

        log_w = jax.lax.map(one, jax.random.split(key, n_samples))
        return -(jax.scipy.special.logsumexp(log_w, axis=0) - jnp.log(float(n_samples)))
