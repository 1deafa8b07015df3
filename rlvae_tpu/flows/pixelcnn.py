"""PixelCNN — autoregressive image density model (flow-zoo completion).

Flax reimplementation of the vendored pythae PixelCNN (reference:
src/lib/src/pythae/models/normalizing_flows/pixelcnn/pixelcnn_model.py:13-93,
utils.py MaskedConv2d): n_layers masked convolutions (type 'A' first — the
center pixel itself is masked — then type 'B'), each followed by BatchNorm +
ReLU, and a 1x1 conv head producing ``n_embeddings`` logits per channel.
The forward returns the per-pixel categorical cross-entropy against the
integer-valued input (range [0, n_embeddings)).

TPU notes: convolutions carry static masks multiplied into the kernels (no
runtime branching), NHWC layout for XLA's TPU conv paths, and the
autoregressive ``sample`` runs as a ``lax.fori_loop`` over pixels with the
whole image re-scored per step (static shapes; H*W steps).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rlvae_tpu.utils.output import ModelOutput


def conv_mask(kernel_size: int, in_ch: int, out_ch: int, mask_type: str) -> np.ndarray:
    """HWIO mask: type 'A' blocks the center pixel and everything after;
    type 'B' allows the center (reference: pixelcnn/utils.py:38-48)."""
    k = kernel_size
    mask = np.ones((k, k, in_ch, out_ch), np.float32)
    center = k // 2
    if mask_type == "A":
        mask[center, center:, :, :] = 0.0
    else:
        mask[center, center + 1 :, :, :] = 0.0
    mask[center + 1 :, :, :, :] = 0.0
    return mask


class MaskedConv(nn.Module):
    features: int
    kernel_size: int
    mask_type: str  # "A" | "B"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        mask = conv_mask(self.kernel_size, in_ch, self.features, self.mask_type)
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            mask=jnp.asarray(mask),
            dtype=jnp.float32,
        )(x)


class PixelCNN(nn.Module):
    """Reference defaults: n_embeddings=256, n_layers=10, kernel_size=5
    (pixelcnn_config.py)."""

    input_dim: Tuple[int, int, int] = (1, 28, 28)  # (C, H, W)
    n_embeddings: int = 256
    n_layers: int = 10
    kernel_size: int = 5
    hidden: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> ModelOutput:
        """x: [B, C, H, W] with integer values in [0, n_embeddings).

        Returns logits [B, n_embeddings, C, H, W] and the cross-entropy loss
        (reference: pixelcnn_model.py:69-93)."""
        c = self.input_dim[0]
        h = jnp.transpose(x.astype(jnp.float32), (0, 2, 3, 1))  # NHWC
        for i in range(self.n_layers):
            h = MaskedConv(self.hidden, self.kernel_size, "A" if i == 0 else "B")(h)
            h = nn.BatchNorm(use_running_average=not train)(h)
            h = nn.relu(h)
        h = nn.Conv(self.n_embeddings * c, (1, 1), dtype=jnp.float32)(h)
        # [B, H, W, n_emb*C] -> [B, n_emb, C, H, W]
        logits = jnp.transpose(
            h.reshape(*h.shape[:3], self.n_embeddings, c), (0, 3, 4, 1, 2)
        )
        labels = jnp.clip(x.astype(jnp.int32), 0, self.n_embeddings - 1)
        logp = jax.nn.log_softmax(logits, axis=1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        return ModelOutput(out=logits, loss=jnp.mean(nll))


def pixelcnn_sample(
    model: PixelCNN,
    variables,
    key: jax.Array,
    n: int,
    temperature: float = 1.0,
) -> jax.Array:
    """Autoregressive sampling: raster-scan fori_loop over (pixel, channel);
    the full image is re-scored each step (static shapes under jit)."""
    c, h, w = model.input_dim

    def score(x):
        return model.apply(variables, x, train=False).out  # [n, E, C, H, W]

    def body(idx, carry):
        x, key = carry
        pix, ch = idx // c, idx % c
        i, j = pix // w, pix % w
        logits = score(x)[:, :, ch, i, j] / temperature  # [n, E]
        key, k = jax.random.split(key)
        val = jax.random.categorical(k, logits, axis=-1).astype(x.dtype)
        x = x.at[:, ch, i, j].set(val)
        return x, key

    x0 = jnp.zeros((n, c, h, w), jnp.int32)
    x, _ = jax.lax.fori_loop(0, h * w * c, body, (x0, key))
    return x
