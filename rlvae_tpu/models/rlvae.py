"""RlVAE — the single configurable Riemannian Flow VAE model family.

One class covers the reference's four model variants (reference:
src/models/riemannian_flow_vae.py:788-1395 monolith,
src/models/modular_rlvae.py:30-596 modular, src/models/hybrid_rlvae.py:30-399
hybrid, and the vanilla-VAE degenerate configuration): capabilities are
explicit static config resolved before jit — no runtime hasattr probing.

Forward pass (reference call stack: riemannian_flow_vae.py:1093-1246):
encode frame 0 -> posterior sample (gaussian / iaf / riemannian_metric, or a
Riemannian sampling method) -> temporal IAF evolution of z_0 ->
open/closed-loop handling -> decode all frames as one fused [B*T] batch ->
reconstruction + KL + flow + loop losses.

The model object is NOT a pytree: it holds static structure (flax modules,
flow masks, the metric buffer, config flags).  All learnable state lives in
the ``variables`` dict threaded through ``forward``; ``forward`` is pure and
jit-safe with a static ``train`` flag.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlvae_tpu.flows import TemporalFlowConfig, apply_temporal_flows
from rlvae_tpu.geometry import load_metric
from rlvae_tpu.geometry.metric import CentroidMetric
from rlvae_tpu.models import losses
from rlvae_tpu.nets import create_decoder, create_encoder
from rlvae_tpu.nets.mlp import MLPDecoder
from rlvae_tpu.samplers import (
    HMCConfig,
    reparam,
    sample_metric_aware_posterior,
    sample_posterior,
    sample_prior,
    sample_prior_hmc,
)
from rlvae_tpu.utils.output import ModelOutput

Array = jax.Array

POSTERIOR_TYPES = ("gaussian", "iaf", "riemannian_metric")
LOOP_MODES = ("open", "closed")


class RlVAE:
    """Riemannian Flow VAE over cyclic longitudinal sequences."""

    def __init__(
        self,
        input_dim: Tuple[int, ...] = (3, 64, 64),
        latent_dim: int = 16,
        n_flows: int = 8,
        flow_hidden_size: int = 256,
        flow_n_blocks: int = 2,
        flow_n_hidden: int = 3,
        beta: float = 1.0,
        riemannian_beta: float = 8.0,
        posterior_type: str = "riemannian_metric",
        sampling_method: str = "geodesic",
        use_riemannian: bool = True,
        loop_mode: str = "open",
        loop_penalty: float = 5.0,
        flow_direction: str = "density",
        flow_log_var_bias_init: float = -2.0,
        flow_fixedpoint_iters: int = 0,
        flow_loss_mode: str = "reference",
        remat_decode: bool = False,
        fused_decode_mse: bool = False,
        encoder_config: Optional[Mapping[str, Any]] = None,
        decoder_config: Optional[Mapping[str, Any]] = None,
        metric: Optional[CentroidMetric] = None,
        pretrained_encoder_path: Optional[str] = None,
        pretrained_decoder_path: Optional[str] = None,
        name: str = "rlvae",
    ):
        if posterior_type not in POSTERIOR_TYPES:
            raise ValueError(f"posterior_type must be one of {POSTERIOR_TYPES}")
        if loop_mode not in LOOP_MODES:
            raise ValueError(f"loop_mode must be one of {LOOP_MODES}")
        if flow_loss_mode not in ("reference", "volume"):
            raise ValueError("flow_loss_mode must be 'reference' or 'volume'")
        self.input_dim = tuple(input_dim)
        self.latent_dim = latent_dim
        self.n_flows = n_flows
        self.beta = float(beta)
        self.riemannian_beta = float(riemannian_beta)
        self.posterior_type = posterior_type
        self.sampling_method = sampling_method
        self.use_riemannian = bool(use_riemannian)
        self.loop_mode = loop_mode
        self.loop_lambda = float(loop_penalty)
        self.flow_loss_mode = flow_loss_mode
        # rematerialized decode+recon-loss for training: the step's binding
        # resource at large batch is HBM bytes, ~80% of which are
        # recon-sized [B*T, pix] tensors saved for the backward
        # (outputs/step_breakdown/).  jax.checkpoint over decode+MSE lets
        # XLA fuse the forward reduction and recompute the decode in the
        # backward — recon never persists in HBM.  Loss-value identical;
        # off by default (parity preset untouched).
        self.remat_decode = bool(remat_decode)
        # strictly-stronger HBM knob: a Pallas kernel computes the final
        # decoder matmul + sigmoid + MSE reduction per VMEM tile with an
        # exact custom VJP (ops/recon_kernels.py), so NO recon-sized tensor
        # ever reaches HBM — remat_decode still writes the pre-activation
        # and cotangent each pass.  MLP decoders only; falls back to the
        # remat/plain path otherwise.  Off by default (parity untouched).
        self.fused_decode_mse = bool(fused_decode_mse)
        self.name = name

        self.encoder = create_encoder(self.input_dim, latent_dim, encoder_config)
        self.decoder = create_decoder(self.input_dim, latent_dim, decoder_config)
        self.flow_config = TemporalFlowConfig(
            latent_dim, n_flows, flow_hidden_size, flow_n_blocks, flow_n_hidden,
            direction=flow_direction,
            log_var_bias_init=flow_log_var_bias_init,
            fixedpoint_iters=flow_fixedpoint_iters,
        )
        self.metric = metric
        # applied by init() so every entry path (CLI, app, tests) starts from
        # the pretrained weights (reference: riemannian_flow_vae.py:921-942)
        self.pretrained_encoder_path = pretrained_encoder_path
        self.pretrained_decoder_path = pretrained_decoder_path

    # -- state ---------------------------------------------------------------

    def init(self, key: Array, n_obs: int = 8, batch_size: int = 2) -> Dict[str, Any]:
        """Initialize all model state, split into trainable ``params`` and
        non-trainable ``stats`` (BatchNorm running statistics) so the
        optimizer only ever touches the former."""
        k_enc, k_dec, k_flows = jax.random.split(key, 3)
        x0 = jnp.zeros((batch_size, *self.input_dim), jnp.float32)
        z0 = jnp.zeros((batch_size, self.latent_dim), jnp.float32)
        enc_vars = dict(self.encoder.init(k_enc, x0))
        dec_vars = dict(self.decoder.init(k_dec, z0))
        variables = {
            "params": {
                "encoder": enc_vars["params"],
                "decoder": dec_vars["params"],
                "flows": self.flow_config.init(k_flows) if self.n_flows > 0 else [],
            },
            "stats": {
                "encoder": enc_vars.get("batch_stats", {}),
                "decoder": dec_vars.get("batch_stats", {}),
            },
        }
        if self.pretrained_encoder_path or self.pretrained_decoder_path:
            try:
                variables = self.load_pretrained_components(
                    variables,
                    encoder_path=self.pretrained_encoder_path,
                    decoder_path=self.pretrained_decoder_path,
                )
            except (ValueError, FileNotFoundError, OSError) as e:
                # architecture mismatch (e.g. a cnn/resnet config pointing at
                # the MLP artifacts) or a missing/unreadable artifact file:
                # warn and train from scratch, matching the reference's
                # tolerant loader, whose bare try/except degrades on ANY
                # failure (encoder_manager.py:260-326)
                print(f"[rlvae] WARNING: pretrained components not loaded: {e}")
        return variables

    def load_pretrained_components(
        self,
        variables: Dict[str, Any],
        encoder_path: Optional[str] = None,
        decoder_path: Optional[str] = None,
    ) -> Dict[str, Any]:
        """Load pretrained encoder/decoder weights into the state
        (reference: riemannian_flow_vae.py:921-942, encoder_manager.py:260-326
        with its key-prefix tolerance).  Accepts component .npz (native) or
        torch .pt state dicts (converted on the fly)."""
        from pathlib import Path as _Path

        from rlvae_tpu.data import convert as _convert

        def load_any(path, kind):
            p = _Path(path)
            for cand in (p, p.with_suffix(".npz"), p.with_suffix(".pt")):
                if cand.exists():
                    p = cand
                    break
            else:
                raise FileNotFoundError(f"Pretrained {kind} not found: {path}")
            if p.suffix == ".npz":
                return _convert.load_component_npz(p)["params"]
            raw = _convert._torch_load(p)
            sd = _convert.state_dict_to_numpy(
                raw if not hasattr(raw, "state_dict") else raw.state_dict()
            )
            conv = (
                _convert.torch_mlp_encoder_to_flax(sd)
                if kind == "encoder"
                else _convert.torch_mlp_decoder_to_flax(sd)
            )
            return conv["params"]

        params = dict(variables["params"])
        for kind, path in (("encoder", encoder_path), ("decoder", decoder_path)):
            if path is None:
                continue
            loaded = jax.tree_util.tree_map(jnp.asarray, load_any(path, kind))
            current = params[kind]
            cur_shapes = jax.tree_util.tree_map(jnp.shape, current)
            new_shapes = jax.tree_util.tree_map(lambda a: tuple(a.shape), loaded)
            if cur_shapes != new_shapes:
                raise ValueError(
                    f"Pretrained {kind} shapes {new_shapes} do not match model {cur_shapes}"
                )
            params[kind] = loaded
        return {**variables, "params": params}

    def load_pretrained_metric(
        self,
        path: str,
        temperature_override: Optional[float] = None,
        regularization_override: Optional[float] = None,
    ) -> None:
        """Attach a pretrained centroid metric (reference:
        riemannian_flow_vae.py:869-919 load_pretrained_metrics)."""
        self.metric = load_metric(
            path,
            temperature_override=temperature_override,
            regularization_override=regularization_override,
        )

    # -- forward -------------------------------------------------------------

    def _apply_net(
        self,
        module,
        variables: Dict[str, Any],
        which: str,
        arg: Array,
        train: bool,
        rng: Optional[Array] = None,
    ):
        fvars = {"params": variables["params"][which]}
        has_stats = bool(variables.get("stats", {}).get(which))
        kwargs = {}
        if has_stats:
            fvars["batch_stats"] = variables["stats"][which]
            kwargs["train"] = train
        if train and rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        out = module.apply(
            fvars,
            arg,
            deterministic=not train,
            mutable=["batch_stats"] if (train and has_stats) else False,
            **kwargs,
        )
        if isinstance(out, tuple):
            result, mutated = out
            return result, dict(mutated).get("batch_stats", {})
        return out, {}

    def encode(
        self, variables: Dict[str, Any], x0: Array, train: bool = False,
        rng: Optional[Array] = None,
    ):
        return self._apply_net(self.encoder, variables, "encoder", x0, train, rng)

    def decode(
        self, variables: Dict[str, Any], z: Array, train: bool = False,
        rng: Optional[Array] = None,
    ):
        return self._apply_net(self.decoder, variables, "decoder", z, train, rng)

    def sample_z0(self, key: Array, mu: Array, log_var: Array) -> Array:
        """Posterior sampling switch (reference: riemannian_flow_vae.py:1111-1161)."""
        if self.posterior_type == "riemannian_metric":
            if self.metric is None:
                return reparam(key, mu, log_var)
            return sample_metric_aware_posterior(self.metric, key, mu, log_var)
        # "iaf" posterior is a declared-but-stubbed option in the reference
        # (riemannian_flow_vae.py:1113-1120) -> gaussian
        if self.use_riemannian and self.metric is not None:
            return sample_posterior(self.metric, key, mu, log_var, self.sampling_method)
        return reparam(key, mu, log_var)

    def forward(
        self,
        variables: Dict[str, Any],
        x: Array,
        key: Array,
        train: bool = False,
        compute_metrics: bool = False,
    ) -> ModelOutput:
        """Full forward pass with losses. Pure; jit with static train flag."""
        batch_size, n_obs = x.shape[0], x.shape[1]
        k_sample, k_drop = jax.random.split(key)

        k_drop_enc, k_drop_dec = jax.random.split(k_drop)
        x0 = x[:, 0]
        enc_out, enc_updates = self.encode(variables, x0, train=train, rng=k_drop_enc)
        mu, log_var = enc_out.embedding, enc_out.log_covariance

        z0 = self.sample_z0(k_sample, mu, log_var)

        if self.n_flows > 0:
            z_seq, log_dets = apply_temporal_flows(
                self.flow_config, variables["params"]["flows"], z0, n_obs
            )
        else:
            z_seq = jnp.repeat(z0[:, None, :], n_obs, axis=1)
            log_dets = jnp.zeros((batch_size, 0), z0.dtype)

        z_last_raw = z_seq[:, -1]
        if self.loop_mode == "closed":
            z_seq = z_seq.at[:, -1].set(z_seq[:, 0])

        z_flat = z_seq.reshape(batch_size * n_obs, self.latent_dim)
        # fused path: MLP decoders without dropout/BN only (the kernel owns
        # the final Dense -> sigmoid -> MSE; hidden layers are recomputed
        # with identical nn.Dense bf16 semantics in _fused_recon_loss)
        use_fused = (
            self.fused_decode_mse and train
            and isinstance(self.decoder, MLPDecoder)
            and self.decoder.dropout == 0
            and not variables.get("stats", {}).get("decoder")
        )
        # remat only when the decoder carries no BN stats (stats come from
        # the plain decode, which would otherwise stay live and double the
        # decode cost)
        use_remat = (
            not use_fused
            and self.remat_decode and train
            and not variables.get("stats", {}).get("decoder")
        )
        if use_fused:
            recon_loss = self._fused_recon_loss(variables, z_flat, x)
        if use_remat:
            def _dec_loss(dec_params, z_flat_, x_):
                vs = {"params": {**variables["params"], "decoder": dec_params},
                      "stats": variables.get("stats", {})}
                d_out, _ = self.decode(vs, z_flat_, train=train, rng=k_drop_dec)
                r = d_out.reconstruction.reshape(
                    batch_size, n_obs, *self.input_dim)
                return losses.reconstruction_loss(r, x_, self.loop_mode)

            recon_loss = jax.checkpoint(_dec_loss)(
                variables["params"]["decoder"], z_flat, x)
        # the full reconstruction for the output contract; in a train step
        # only scalar metrics are consumed, so XLA dead-code-eliminates this
        # decode entirely when use_remat is True
        dec_out, dec_updates = self.decode(variables, z_flat, train=train, rng=k_drop_dec)
        recon = dec_out.reconstruction.reshape(batch_size, n_obs, *self.input_dim)

        if not (use_remat or use_fused):
            recon_loss = losses.reconstruction_loss(recon, x, self.loop_mode)

        if self.posterior_type == "riemannian_metric" and self.metric is not None:
            kl = losses.riemannian_metric_kl(self.metric, mu, z0)
            kl_weight = self.riemannian_beta
        else:
            kl = losses.standard_kl(mu, log_var)
            kl_weight = self.beta

        flow = losses.flow_loss(log_dets, self.flow_loss_mode)
        loop = (
            losses.loop_penalty(z_last_raw, z_seq[:, 0])
            if self.loop_mode == "closed"
            else jnp.zeros(())
        )
        total = losses.total_loss(recon_loss, kl, flow, loop, kl_weight, self.loop_lambda)

        out = ModelOutput(
            recon_x=recon,
            z=z_seq,
            mu=mu,
            log_var=log_var,
            loss=total,
            recon_loss=recon_loss,
            kld_loss=kl,
            flow_loss=flow,
            loop_penalty=loop,
        )
        if enc_updates or dec_updates:
            out["state_updates"] = {"encoder": enc_updates, "decoder": dec_updates}
        if compute_metrics:
            out["metrics"] = losses.additional_metrics(
                x, recon, z_seq, self.metric if self.use_riemannian else None
            )
        return out

    def _fused_recon_loss(
        self, variables: Dict[str, Any], z_flat: Array, x: Array
    ) -> Array:
        """Reconstruction loss via the fused Pallas decode+MSE kernel.

        Recomputes the MLP decoder's hidden stack with nn.Dense's exact
        dtype semantics (inputs and params cast to ``decoder.dtype``), then
        hands the final Dense's weights plus the flattened targets to
        ops/recon_kernels.decode_mse.  Row weights fold the closed-loop
        frame-0 double count and the 1/B batch mean
        (reference: riemannian_flow_vae.py:1192-1197)."""
        from rlvae_tpu.ops.recon_kernels import decode_mse

        dec = variables["params"]["decoder"]
        dt = self.decoder.dtype
        h = z_flat.astype(dt)
        for i in range(len(self.decoder.hidden_dims)):
            p = dec[f"hidden_{i}"]
            h = jax.nn.relu(
                jnp.dot(h, p["kernel"].astype(dt)) + p["bias"].astype(dt)
            )
        batch_size, n_obs = x.shape[0], x.shape[1]
        w_t = jnp.ones((n_obs,), jnp.float32)
        if self.loop_mode == "closed":
            w_t = w_t.at[0].set(2.0)
        rw = jnp.tile(w_t, batch_size) / batch_size  # rows are [b*T + t]
        x_flat = x.reshape(batch_size * n_obs, -1)
        out_p = dec["out"]
        return decode_mse(h, out_p["kernel"], out_p["bias"], x_flat, rw)

    __call__ = forward

    # -- generation ----------------------------------------------------------

    def sample_riemannian_prior(
        self, key: Array, num_samples: int, method: str = "geodesic",
        plan: Optional[dict] = None,
    ) -> Array:
        """Latent prior sampling (reference: riemannian_flow_vae.py:1312-1326);
        method 'hmc'/'official' runs the full manifold HMC chain;
        'adaptive' is the beyond-reference budgeted dual-averaging chain
        (~0.65 acceptance vs the official chain's ~4.7% on the real metric,
        path-length-preserving trajectories, equal leapfrog budget —
        samplers/hmc.py:sample_prior_hmc_adaptive_budget).  With a ``plan``
        from calibrate_adaptive_plan, 'adaptive' instead runs the calibrated
        fixed-eps chain (sample_prior_hmc_planned) — fully jittable (the
        plan's n_lf/eps/pool are trace-time constants), which is what lets
        the serving engine batch adaptive generation (outputs/adaptive_hmc/)."""
        if method == "adaptive" and self.metric is not None:
            if plan is not None:
                from rlvae_tpu.samplers import sample_prior_hmc_planned

                return sample_prior_hmc_planned(
                    self.metric, key, num_samples, plan,
                    config=HMCConfig(init="centroids"),
                )
            from rlvae_tpu.samplers import sample_prior_hmc_adaptive_budget

            return sample_prior_hmc_adaptive_budget(
                self.metric, key, num_samples, HMCConfig(init="centroids")
            )
        if method in ("hmc", "official") and self.metric is not None:
            cfg = HMCConfig(init="centroids" if method == "official" else "randn")
            return sample_prior_hmc(self.metric, key, num_samples, cfg)
        return sample_prior(self.metric, key, num_samples, self.latent_dim, method)

    def generate(
        self,
        variables: Dict[str, Any],
        key: Array,
        num_samples: int,
        n_obs: int = 8,
        method: str = "geodesic",
        plan: Optional[dict] = None,
    ) -> Array:
        """Sample prior latents, evolve through time, decode to sequences."""
        z0 = self.sample_riemannian_prior(key, num_samples, method, plan=plan)
        if self.n_flows > 0:
            z_seq, _ = apply_temporal_flows(self.flow_config, variables["params"]["flows"], z0, n_obs)
        else:
            z_seq = jnp.repeat(z0[:, None, :], n_obs, axis=1)
        dec_out, _ = self.decode(variables, z_seq.reshape(-1, self.latent_dim))
        return dec_out.reconstruction.reshape(num_samples, n_obs, *self.input_dim)

    def estimate_nll(
        self,
        variables: Dict[str, Any],
        x: Array,
        key: Array,
        n_samples: int = 50,
    ) -> Array:
        """Importance-sampled negative log-likelihood per sequence, [B].

        Estimates -log p(x) = -log E_{q(z0|x0)}[ p(x|z0) p(z0) / q(z0|x0) ]
        with S posterior samples and a logsumexp average (reference: pythae
        vae_model.py get_nll / rhvae_model.py:486+ importance-sampled NLL,
        adapted to the sequence generative model where z_{t>0} are
        deterministic flow images of z0).

        For the ``riemannian_metric`` posterior the importance distribution
        is q(z0|x0) = N(mu, G^{-1}(mu)) — the metric-aware posterior the
        model actually samples — while the prior is the standard normal,
        exactly as the reference's own Riemannian NLL estimator
        (pythae rhvae_model.py:486-496 ``_log_z`` is N(0, I) even for the
        RHVAE).  The uniform-on-manifold density sqrt(det G)/V the KL is
        derived against is NOT usable here: with the lbd*I floor on
        G^{-1}, int sqrt(det G) dz diverges over R^D, so any Monte-Carlo
        "volume" is proposal-dependent and the resulting numbers are not
        comparable across metrics."""
        import math

        b, n_obs = x.shape[0], x.shape[1]
        d = self.latent_dim
        enc_out, _ = self.encode(variables, x[:, 0])
        mu, log_var = enc_out.embedding, enc_out.log_covariance

        riemannian = self.posterior_type == "riemannian_metric" and self.metric is not None
        if riemannian:
            from rlvae_tpu.geometry import metric as gm

            l_mu = gm.chol_g_inv(self.metric, mu)  # [B, D, D]
            half_logdet_gi_mu = jnp.sum(
                jnp.log(jnp.diagonal(l_mu, axis1=-2, axis2=-1)), axis=-1
            )  # 0.5 log det G^{-1}(mu)
        else:
            std = jnp.exp(0.5 * log_var)

        def one_sample(k):
            eps = jax.random.normal(k, mu.shape)
            if riemannian:
                z0 = mu + jnp.einsum("bij,bj->bi", l_mu, eps)
                # log N(z0; mu, G^{-1}(mu))
                log_qz = (
                    -0.5 * jnp.sum(eps**2, axis=1)
                    - 0.5 * d * math.log(2 * math.pi)
                    - half_logdet_gi_mu
                )
                # standard-normal prior, matching the reference's own
                # Riemannian NLL (pythae rhvae_model.py:486-496)
                log_pz = -0.5 * jnp.sum(z0**2, axis=1) - 0.5 * d * math.log(
                    2 * math.pi
                )
            else:
                z0 = mu + eps * std
                log_qz = (
                    -0.5 * jnp.sum(eps**2, axis=1)
                    - 0.5 * d * math.log(2 * math.pi)
                    - 0.5 * jnp.sum(log_var, axis=1)
                )
                log_pz = -0.5 * jnp.sum(z0**2, axis=1) - 0.5 * d * math.log(2 * math.pi)
            if self.n_flows > 0:
                z_seq, _ = apply_temporal_flows(
                    self.flow_config, variables["params"]["flows"], z0, n_obs
                )
            else:
                z_seq = jnp.repeat(z0[:, None, :], n_obs, axis=1)
            dec_out, _ = self.decode(variables, z_seq.reshape(b * n_obs, d))
            recon = dec_out.reconstruction.reshape(b, n_obs, *self.input_dim)
            # unit-variance Gaussian observation model
            log_px_z = -0.5 * jnp.sum(
                (recon - x).reshape(b, -1) ** 2, axis=1
            ) - 0.5 * x[0].size * math.log(2 * math.pi)
            return log_px_z + log_pz - log_qz

        log_w = jax.lax.map(one_sample, jax.random.split(key, n_samples))  # [S, B]
        return -(jax.scipy.special.logsumexp(log_w, axis=0) - jnp.log(float(n_samples)))

    # -- introspection -------------------------------------------------------

    def param_count(self, variables: Dict[str, Any]) -> int:
        # trainable parameters only — BN running stats under 'stats' are
        # buffers, not parameters (reference counts p.numel() over
        # self.parameters(), encoder_manager.py:257)
        tree = variables.get("params", variables)
        return sum(a.size for a in jax.tree_util.tree_leaves(tree))

    def get_model_summary(self, variables: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        """Model summary (reference: modular_rlvae.py:459-520)."""
        summary = {
            "model_name": self.name,
            "architecture": {
                "latent_dim": self.latent_dim,
                "n_flows": self.n_flows,
                "input_dim": list(self.input_dim),
                "encoder": type(self.encoder).__name__,
                "decoder": type(self.decoder).__name__,
            },
            "configuration": {
                "posterior_type": self.posterior_type,
                "sampling_method": self.sampling_method,
                "use_riemannian": self.use_riemannian,
                "loop_mode": self.loop_mode,
                "beta": self.beta,
                "riemannian_beta": self.riemannian_beta,
            },
            "metric": None
            if self.metric is None
            else {
                "n_centroids": self.metric.n_centroids,
                # one device_get for both scalars (per-scalar float() is a
                # ~ms tunnel round-trip each, CLAUDE.md)
                **{
                    k: float(v)
                    for k, v in jax.device_get(
                        {
                            "temperature": self.metric.temperature,
                            "regularization": self.metric.regularization,
                        }
                    ).items()
                },
            },
        }
        if variables is not None:
            summary["parameter_count"] = int(self.param_count(variables))
        return summary
