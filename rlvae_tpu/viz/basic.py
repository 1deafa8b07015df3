"""Basic visualizations: cyclicity analysis, sequence trajectories,
reconstruction grids (reference: src/visualizations/basic.py:21-317)."""

from __future__ import annotations

from typing import List

import jax
import numpy as np

from rlvae_tpu.viz.base import BaseVisualization


def _to_img(frame: np.ndarray) -> np.ndarray:
    """[C, H, W] -> [H, W, C] clipped to [0, 1]."""
    return np.clip(np.transpose(frame, (1, 2, 0)), 0.0, 1.0)


class BasicVisualizations(BaseVisualization):
    def run(self, epoch: int, model, variables, sample_batch) -> List:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        x = np.asarray(sample_batch, np.float32)
        out = self.forward(model, variables, x, jax.random.PRNGKey(epoch))
        recon = np.asarray(out.recon_x)
        z = np.asarray(out.z)
        written = []

        # 1. Reconstruction grid as a single montage imshow (one axes; a
        # subplot per frame is ~30x slower on matplotlib)
        n_show = min(4, x.shape[0])
        t_show = x.shape[1]
        rows = []
        for i in range(n_show):
            rows.append(np.concatenate([_to_img(x[i, t]) for t in range(t_show)], axis=1))
            rows.append(np.concatenate([_to_img(recon[i, t]) for t in range(t_show)], axis=1))
        montage = np.concatenate(rows, axis=0)
        fig, ax = plt.subplots(figsize=(1.4 * t_show, 1.4 * 2 * n_show))
        ax.imshow(montage)
        ax.set_xticks([]), ax.set_yticks([])
        ax.set_title(f"Reconstructions (epoch {epoch}) — orig/recon row pairs")
        written.append(self.save_figure(fig, epoch, "reconstructions"))

        # 2. Cyclicity analysis: first-vs-last MSE for orig / recon / latent
        mse_orig = np.mean((x[:, 0] - x[:, -1]) ** 2, axis=(1, 2, 3))
        mse_recon = np.mean((recon[:, 0] - recon[:, -1]) ** 2, axis=(1, 2, 3))
        mse_latent = np.mean((z[:, 0] - z[:, -1]) ** 2, axis=1)
        fig, ax = plt.subplots(figsize=(6, 4))
        idx = np.arange(len(mse_orig))
        width = 0.27
        ax.bar(idx - width, mse_orig, width, label="original")
        ax.bar(idx, mse_recon, width, label="reconstruction")
        ax.bar(idx + width, mse_latent, width, label="latent")
        ax.set_xlabel("sequence"), ax.set_ylabel("first-vs-last MSE")
        ax.set_yscale("log")
        ax.legend()
        ax.set_title(f"Cyclicity (epoch {epoch})")
        written.append(self.save_figure(fig, epoch, "cyclicity"))

        # 3. Latent trajectories in PCA space
        proj, _ = self.pca_fit_transform(z)
        fig, ax = plt.subplots(figsize=(5, 5))
        for i in range(min(8, proj.shape[0])):
            ax.plot(proj[i, :, 0], proj[i, :, 1], "-o", ms=3, alpha=0.7)
            ax.plot(proj[i, 0, 0], proj[i, 0, 1], "k^", ms=6)
        ax.set_title(f"Latent trajectories, PCA (epoch {epoch})")
        written.append(self.save_figure(fig, epoch, "trajectories"))
        return written
