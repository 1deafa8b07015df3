#!/usr/bin/env python
"""Train a vanilla VAE on sequence frames and export pretrained components.

Equivalent of the reference's component-provenance script (reference:
scripts/train_and_extract_vanilla_vae.py:27 — train a vanilla VAE on Sprites
frames, export encoder/decoder; the metric comes from RHVAE training,
SURVEY.md §3.5).  Produces:

    data/pretrained/encoder.npz      (flax MLPEncoder params)
    data/pretrained/decoder.npz      (flax MLPDecoder params)
    data/pretrained/metric.npz       (RHVAE-learned centroid metric)

Usage:
    python scripts/train_and_extract_components.py [--dataset PATH]
        [--epochs 50] [--metric-epochs 10] [--latent-dim 16] [--synthetic N]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", type=Path, default=None,
                    help="[N,T,C,H,W] dataset (.npz/.pt); synthetic if omitted")
    ap.add_argument("--synthetic", type=int, default=200)
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--metric-epochs", type=int, default=10)
    ap.add_argument("--latent-dim", type=int, default=16)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=42,
                    help="synthetic-data seed; 42 matches CyclicDataModule's default")
    ap.add_argument("--metric-centroids", type=int, default=200,
                    help="cap the consolidated metric at this many centroids "
                         "(reference metric.pt ships 200)")
    ap.add_argument("--out-dir", type=Path, default=REPO / "data" / "pretrained")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from rlvae_tpu.data import generate_cyclic_sequences
    from rlvae_tpu.data.cyclic import _load_array
    from rlvae_tpu.geometry import save_metric
    from rlvae_tpu.geometry.pretrain import RHVAE, train_metric
    from rlvae_tpu.nets import MLPDecoder, MLPEncoder

    if args.dataset is not None:
        seqs = _load_array(args.dataset)
    else:
        seqs = generate_cyclic_sequences(
            args.synthetic, n_obs=8, image_size=(args.image_size, args.image_size),
            seed=args.seed,
        )
    frames = seqs.reshape(-1, *seqs.shape[2:]).astype(np.float32)
    input_dim = tuple(frames.shape[1:])
    print(f"training on {frames.shape[0]} frames, input_dim={input_dim}")

    encoder = MLPEncoder(input_dim=input_dim, latent_dim=args.latent_dim)
    decoder = MLPDecoder(input_dim=input_dim, latent_dim=args.latent_dim)
    key = jax.random.PRNGKey(42)
    k_e, k_d, key = jax.random.split(key, 3)
    params = {
        "encoder": dict(encoder.init(k_e, jnp.zeros((2, *input_dim))))["params"],
        "decoder": dict(decoder.init(k_d, jnp.zeros((2, args.latent_dim))))["params"],
    }
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, batch, key):
        def loss_fn(p):
            enc = encoder.apply({"params": p["encoder"]}, batch)
            eps = jax.random.normal(key, enc.embedding.shape)
            z = enc.embedding + eps * jnp.exp(0.5 * enc.log_covariance)
            recon = decoder.apply({"params": p["decoder"]}, z).reconstruction
            recon_l = jnp.mean(jnp.sum((recon - batch).reshape(batch.shape[0], -1) ** 2, -1))
            kl = jnp.mean(
                -0.5 * jnp.sum(1 + enc.log_covariance - enc.embedding**2
                               - jnp.exp(enc.log_covariance), -1)
            )
            return recon_l + kl

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    bs = args.batch_size
    n = (frames.shape[0] // bs) * bs
    for epoch in range(args.epochs):
        perm = np.random.default_rng(epoch).permutation(frames.shape[0])[:n]
        losses = []
        for b in range(n // bs):
            key, k_s = jax.random.split(key)
            batch = jnp.asarray(frames[perm[b * bs : (b + 1) * bs]])
            params, opt_state, loss = step(params, opt_state, batch, k_s)
            losses.append(loss)  # device scalar; fetched once per epoch
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            losses = jax.device_get(losses)
            print(f"[vae] epoch {epoch}: loss {np.mean(losses):.3f}")

    args.out_dir.mkdir(parents=True, exist_ok=True)

    def save_flat(tree, path):
        flat = {}

        def walk(node, prefix=""):
            for k, v in node.items():
                kk = f"{prefix}/{k}" if prefix else k
                (walk(v, kk) if isinstance(v, dict) else flat.__setitem__(kk, np.asarray(v)))

        walk({"params": tree})
        np.savez(path, **flat)

    save_flat(params["encoder"], args.out_dir / "encoder.npz")
    save_flat(params["decoder"], args.out_dir / "decoder.npz")
    print(f"wrote {args.out_dir}/encoder.npz, decoder.npz")

    # metric via RHVAE, warm-starting its encoder/decoder from the VAE so the
    # learned centroids live where the pretrained encoder puts latents
    # (the reference's provenance chain, SURVEY §3.5)
    rhvae = RHVAE(input_dim=input_dim, latent_dim=args.latent_dim)
    metric, info = train_metric(
        rhvae, frames, n_epochs=args.metric_epochs, batch_size=bs, log_every=2,
        warm_start=params,
    )
    if metric.n_centroids > args.metric_centroids:
        sel = np.random.default_rng(args.seed).choice(
            metric.n_centroids, args.metric_centroids, replace=False
        )
        from rlvae_tpu.geometry.metric import CentroidMetric

        metric = CentroidMetric.create(
            np.asarray(metric.centroids)[sel],
            np.asarray(metric.matrices)[sel],
            float(metric.temperature),
            float(metric.regularization),
        )
    save_metric(metric, args.out_dir / "metric.npz")
    print(f"wrote {args.out_dir}/metric.npz ({metric.n_centroids} centroids)")


if __name__ == "__main__":
    main()
