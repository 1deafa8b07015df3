"""RHVAE metric pre-training — regenerating `metric.npz` from scratch.

JAX reimplementation of the pythae RHVAE training path that produced the
reference's pretrained metric artifacts (reference: pythae
models/rhvae/rhvae_model.py:59-447; SURVEY.md §3.5 data provenance):

- a metric network maps each image to a Cholesky factor L (flatten -> 400 ->
  ReLU -> {exp-diag, strict-lower} assembly; reference:
  default_architectures.py:223-262),
- the training forward solves Riemannian Hamiltonian dynamics with the
  *generalized leapfrog* integrator: implicit steps via fixed-point
  iterations (3) over gradients of H = -log p(x,z) + 0.5 rho^T G^{-1} rho
  + 0.5 log det G, where gradients flow through the decoder AND the batch
  metric (rhvae_model.py:328-379).  In JAX each gradient is a ``jax.grad``
  of the Hamiltonian closure (with ``jax.checkpoint`` to bound memory),
- per-batch (L L^T, mu) pairs accumulate in a bounded ring buffer (deque
  maxlen=100, rhvae_model.py:91-92) and consolidate into
  (M_tens, centroids_tens) at epoch end (rhvae_model.py:385-422),
- the loss is the Hamiltonian importance bound
  -(log p(x, z_K) + log p(rho_K) - log q(z_0|x)) (rhvae_model.py:424-447).

Faithful quirks kept: ``beta_zero_sqrt`` stores the *raw* beta_zero value
(pythae initializes the field named "sqrt" with beta_zero itself,
rhvae_model.py:80-82); step 2 of the integrator uses the stale metric, which
collapses its fixed point to the explicit update z + eps G^{-1}(z_old) rho.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rlvae_tpu.geometry.metric import CentroidMetric
from rlvae_tpu.nets import create_decoder, create_encoder
from rlvae_tpu.geometry import metric as gm
from rlvae_tpu.ops import linalg as linalg_ops
from rlvae_tpu.utils.output import ModelOutput

Array = jax.Array


class MetricMLP(nn.Module):
    """x -> lower-triangular Cholesky factor L [B, D, D]."""

    input_dim: Tuple[int, ...]
    latent_dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = self.latent_dim
        h = nn.relu(nn.Dense(400, dtype=jnp.float32, name="hidden")(x.reshape(x.shape[0], -1)))
        diag = nn.Dense(d, dtype=jnp.float32, name="diag")(h)
        k = d * (d - 1) // 2
        lower = nn.Dense(k, dtype=jnp.float32, name="lower")(h)
        rows, cols = jnp.tril_indices(d, k=-1)
        l_mat = jnp.zeros((x.shape[0], d, d), jnp.float32)
        l_mat = l_mat.at[:, rows, cols].set(lower)
        l_mat = l_mat + jax.vmap(jnp.diag)(jnp.exp(diag))
        return l_mat


def _batch_g_inv(z, centroids, m_mats, temperature, lbd):
    """Local training metric from the batch's (M, mu) pairs
    (reference: rhvae_model.py:180-190) — delegates to the production
    centroid-metric closure (geometry/metric.g_inv: MXU formulation,
    HIGHEST precision) so the formula lives in exactly one place."""
    metric = CentroidMetric(
        centroids=centroids,
        matrices=m_mats,
        temperature=jnp.asarray(temperature, jnp.float32),
        regularization=jnp.asarray(lbd, jnp.float32),
        latent_dim=int(z.shape[-1]),
    )
    return gm.g_inv(metric, z)


class RHVAE:
    """Riemannian Hamiltonian VAE for metric learning."""

    def __init__(
        self,
        input_dim: Tuple[int, ...] = (3, 64, 64),
        latent_dim: int = 16,
        n_lf: int = 3,
        eps_lf: float = 1e-3,
        beta_zero: float = 0.3,
        temperature: float = 1.5,
        regularization: float = 0.01,
        fixed_point_steps: int = 3,
        encoder_config: Optional[Mapping[str, Any]] = None,
        decoder_config: Optional[Mapping[str, Any]] = None,
    ):
        self.input_dim = tuple(input_dim)
        self.latent_dim = latent_dim
        self.n_lf = n_lf
        self.eps_lf = eps_lf
        # pythae quirk: the "sqrt" field holds beta_zero itself
        self.beta_zero_sqrt = beta_zero
        self.temperature = temperature
        self.lbd = regularization
        self.fixed_point_steps = fixed_point_steps

        self.encoder = create_encoder(self.input_dim, latent_dim, encoder_config)
        self.decoder = create_decoder(self.input_dim, latent_dim, decoder_config)
        self.metric_net = MetricMLP(self.input_dim, latent_dim)

        # host-side ring buffer of per-batch (M, mu) (deque maxlen=100)
        self.buffer_m: list = []
        self.buffer_mu: list = []
        self.buffer_maxlen = 100

    # -- state ----------------------------------------------------------------

    def init(self, key: Array, batch_size: int = 2) -> Dict[str, Any]:
        k1, k2, k3 = jax.random.split(key, 3)
        x0 = jnp.zeros((batch_size, *self.input_dim), jnp.float32)
        z0 = jnp.zeros((batch_size, self.latent_dim), jnp.float32)
        return {
            "params": {
                "encoder": dict(self.encoder.init(k1, x0))["params"],
                "decoder": dict(self.decoder.init(k2, z0))["params"],
                "metric": dict(self.metric_net.init(k3, x0))["params"],
            }
        }

    # -- physics --------------------------------------------------------------

    def _log_p_xz(self, params, x, z):
        """log p(x|z) (unit-variance Gaussian decoder) + log N(z; 0, I)
        (reference: rhvae_model.py:486-520)."""
        recon = self.decoder.apply({"params": params["decoder"]}, z).reconstruction
        logpx = -0.5 * jnp.sum(
            (recon.reshape(z.shape[0], -1) - x.reshape(z.shape[0], -1)) ** 2, axis=-1
        )
        logpz = -0.5 * jnp.sum(z**2, axis=-1) - 0.5 * self.latent_dim * math.log(2 * math.pi)
        return logpx + logpz

    def _hamiltonian(self, params, x, z, rho, centroids, m_mats):
        gi = _batch_g_inv(z, centroids, m_mats, self.temperature, self.lbd)
        # unrolled-Cholesky logdet + HIGHEST-precision quad form: [B,16,16]
        # jnp.linalg in a jitted-and-differentiated hot path is the layout
        # trap CLAUDE.md documents; this Hamiltonian is evaluated (and
        # grad'd) fixed_point_steps x n_lf times per train step
        g_log_det = -linalg_ops.logdet_from_chol(linalg_ops.cholesky_small(gi))
        quad = jnp.einsum("bi,bij,bj->b", rho, gi, rho,
                          precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(-self._log_p_xz(params, x, z) + 0.5 * quad + 0.5 * g_log_det)

    def forward(self, params: Dict[str, Any], x: Array, key: Array) -> ModelOutput:
        """Training forward: encode, metric net, generalized leapfrog, loss."""
        enc = self.encoder.apply({"params": params["encoder"]}, x)
        mu, log_var = enc.embedding, enc.log_covariance
        k_eps, k_gamma = jax.random.split(key)
        eps0 = jax.random.normal(k_eps, mu.shape)
        z0 = mu + eps0 * jnp.exp(0.5 * log_var)

        l_mat = self.metric_net.apply({"params": params["metric"]}, x)
        m_mats = l_mat @ jnp.swapaxes(l_mat, -1, -2)
        centroids = mu  # batch-local metric centered on mu(x_i)

        ham = jax.checkpoint(
            lambda z, rho: self._hamiltonian(params, x, z, rho, centroids, m_mats)
        )
        grad_z = jax.grad(ham, argnums=0)

        gamma = jax.random.normal(k_gamma, z0.shape)
        rho = gamma / self.beta_zero_sqrt
        # rho ~ N(0, G): transform with the metric net's L directly
        # (training branch, rhvae_model.py:172-204)
        rho = jnp.einsum("bij,bj->bi", l_mat, rho,
                         precision=jax.lax.Precision.HIGHEST)

        z = z0
        beta_sqrt_old = self.beta_zero_sqrt
        eps = self.eps_lf
        for k in range(self.n_lf):
            # step 1: implicit momentum half-step via fixed-point iterations
            rho_ = rho
            for _ in range(self.fixed_point_steps):
                rho_ = rho - 0.5 * eps * grad_z(z, rho_)
            # step 2: the stale-metric fixed point is explicit (see module doc)
            gi_old = _batch_g_inv(z, centroids, m_mats, self.temperature, self.lbd)
            z = z + eps * jnp.einsum("bij,bj->bi", gi_old, rho_,
                                     precision=jax.lax.Precision.HIGHEST)
            # step 3: explicit momentum half-step at the new position
            rho = rho_ - 0.5 * eps * grad_z(z, rho_)
            # tempering (reference: rhvae_model.py:455-462)
            beta_sqrt = 1.0 / (
                (1.0 - 1.0 / self.beta_zero_sqrt) * ((k + 1) / self.n_lf) ** 2
                + 1.0 / self.beta_zero_sqrt
            )
            rho = (beta_sqrt_old / beta_sqrt) * rho
            beta_sqrt_old = beta_sqrt

        # loss: -(log p(x, z_K) + log p(rho_K) - log q(z_0|x))
        gi_k = _batch_g_inv(z, centroids, m_mats, self.temperature, self.lbd)
        g_log_det_k = -linalg_ops.logdet_from_chol(linalg_ops.cholesky_small(gi_k))
        logpxz = self._log_p_xz(params, x, z)
        log_rho_k = (
            -0.5 * jnp.einsum("bi,bij,bj->b", rho, gi_k, rho,
                              precision=jax.lax.Precision.HIGHEST)
            - 0.5 * g_log_det_k
        )
        logq = (
            -0.5 * jnp.sum(eps0**2, axis=-1)
            - 0.5 * self.latent_dim * math.log(2 * math.pi)
            - 0.5 * jnp.sum(log_var, axis=-1)
        )
        loss = -jnp.mean(logpxz + log_rho_k - logq)

        recon = self.decoder.apply({"params": params["decoder"]}, z).reconstruction
        return ModelOutput(
            loss=loss, z0=z0, z=z, rho=rho, mu=mu, log_var=log_var,
            m_mats=m_mats, recon_x=recon,
        )

    # -- metric consolidation -------------------------------------------------

    def record_batch(self, m_mats: np.ndarray, mu: np.ndarray) -> None:
        self.buffer_m.append(np.asarray(m_mats))
        self.buffer_mu.append(np.asarray(mu))
        if len(self.buffer_m) > self.buffer_maxlen:
            self.buffer_m.pop(0)
            self.buffer_mu.pop(0)

    def consolidate_metric(self) -> CentroidMetric:
        """Epoch-end update: concatenate the ring buffer into the final
        centroid metric (reference: rhvae_model.py:385-422)."""
        if not self.buffer_m:
            raise RuntimeError("No batches recorded; train before consolidating")
        m_tens = np.concatenate(self.buffer_m, axis=0)
        centroids = np.concatenate(self.buffer_mu, axis=0)
        return CentroidMetric.create(centroids, m_tens, self.temperature, self.lbd)


def train_metric(
    rhvae: RHVAE,
    data: np.ndarray,
    n_epochs: int = 10,
    batch_size: int = 32,
    learning_rate: float = 1e-3,
    seed: int = 42,
    log_every: int = 0,
    warm_start: Optional[Dict[str, Any]] = None,
) -> Tuple[CentroidMetric, Dict[str, Any]]:
    """Train the RHVAE on individual frames and return the learned metric.

    ``data`` is [N, C, H, W] frames (sequences flattened upstream; reference
    provenance: scripts/train_and_extract_vanilla_vae.py + RHVAE training).
    ``warm_start`` optionally seeds the RHVAE encoder/decoder from pretrained
    VAE params (same flax modules) so the learned metric's centroids live in
    the same latent region the pretrained encoder maps data into — the
    geometric-consistency requirement of the provenance chain (SURVEY §3.5).
    """
    import optax

    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    params = rhvae.init(k_init)["params"]
    if warm_start:
        params = {**params, **{k: warm_start[k] for k in ("encoder", "decoder") if k in warm_start}}
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, batch, key):
        def loss_fn(p):
            out = rhvae.forward(p, batch, key)
            return out.loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, out.m_mats, out.mu

    n = (data.shape[0] // batch_size) * batch_size
    history = []
    for epoch in range(n_epochs):
        perm = np.random.default_rng(seed + epoch).permutation(data.shape[0])[:n]
        epoch_loss = []
        for b in range(n // batch_size):
            batch = jnp.asarray(data[perm[b * batch_size : (b + 1) * batch_size]])
            key, k_step = jax.random.split(key)
            params, opt_state, loss, m_mats, mu = step(params, opt_state, batch, k_step)
            rhvae.record_batch(np.asarray(m_mats), np.asarray(mu))
            epoch_loss.append(float(loss))
        history.append(float(np.mean(epoch_loss)))
        if log_every and epoch % log_every == 0:
            print(f"[rhvae] epoch {epoch}: loss {history[-1]:.3f}")

    metric = rhvae.consolidate_metric()
    return metric, {"params": params, "loss_history": history}
