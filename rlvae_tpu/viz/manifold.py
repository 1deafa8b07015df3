"""Manifold visualizations: sqrt(det G^{-1}) heatmaps over a PCA grid, PCA
analyses, temporal metric evolution (reference:
src/visualizations/manifold.py:22-470).  Grid metric evaluations are batched
through the fused geometry path.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from rlvae_tpu.viz.base import BaseVisualization


class ManifoldVisualizations(BaseVisualization):
    def run(self, epoch: int, model, variables, sample_batch) -> List:
        if model.metric is None:
            return []
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from rlvae_tpu.geometry import log_sqrt_det_g_inv

        x = np.asarray(sample_batch, np.float32)
        out = self.forward(model, variables, x, jax.random.PRNGKey(epoch))
        z = np.asarray(out.z)  # [B, T, D]
        written = []

        # PCA plane through the latents + centroids
        flat = z.reshape(-1, z.shape[-1])
        cents = np.asarray(model.metric.centroids)
        proj, pca = self.pca_fit_transform(np.concatenate([flat, cents], axis=0))
        z_proj, c_proj = proj[: len(flat)], proj[len(flat):]

        # grid in PCA plane -> back-project -> sqrt(det G^{-1}) heatmap
        lo = proj.min(0) - 1.0
        hi = proj.max(0) + 1.0
        n_grid = 60
        gx, gy = np.meshgrid(
            np.linspace(lo[0], hi[0], n_grid), np.linspace(lo[1], hi[1], n_grid)
        )
        grid2 = np.stack([gx.ravel(), gy.ravel()], axis=1)
        if hasattr(pca, "inverse_transform"):
            grid_d = pca.inverse_transform(grid2)
        else:
            mean, comp = pca
            grid_d = grid2 @ comp + mean
        vals = np.asarray(
            log_sqrt_det_g_inv(model.metric, jnp.asarray(grid_d, jnp.float32))
        ).reshape(n_grid, n_grid)

        fig, ax = plt.subplots(figsize=(6.5, 5.5))
        im = ax.pcolormesh(gx, gy, vals, shading="auto", cmap="viridis")
        fig.colorbar(im, ax=ax, label=r"$\log\sqrt{\det G^{-1}(z)}$")
        ax.scatter(c_proj[:, 0], c_proj[:, 1], c="red", s=12, marker="x", label="centroids")
        zs = z_proj.reshape(z.shape[0], z.shape[1], 2)
        for i in range(min(6, zs.shape[0])):
            ax.plot(zs[i, :, 0], zs[i, :, 1], "-o", ms=2, c="white", alpha=0.7)
        ax.legend(loc="upper right")
        ax.set_title(f"Metric heatmap over PCA plane (epoch {epoch})")
        written.append(self.save_figure(fig, epoch, "manifold_heatmap"))

        # curvature landscape on the PCA plane (exact autodiff Gaussian
        # curvature; the reference's finite-difference analogue is gated the
        # same way, train_cyclic_loop_comparison.py:3416-3591)
        if not getattr(self.config, "disable_curvature", True):
            import jax.numpy as jnp2

            from rlvae_tpu.geometry.curvature import gaussian_curvature_2d

            if hasattr(pca, "components_"):
                basis = jnp2.asarray(pca.components_[:2].T)
                origin = jnp2.asarray(pca.mean_)
            else:
                mean, comp = pca
                basis = jnp2.asarray(comp[:2].T)
                origin = jnp2.asarray(mean)
            n_curv = 30
            cgx, cgy = np.meshgrid(
                np.linspace(lo[0], hi[0], n_curv), np.linspace(lo[1], hi[1], n_curv)
            )
            pts = np.stack([cgx.ravel(), cgy.ravel()], axis=1)
            curv = np.asarray(
                gaussian_curvature_2d(model.metric, basis, origin, jnp2.asarray(pts))
            ).reshape(n_curv, n_curv)
            fig, ax = plt.subplots(figsize=(6.5, 5.5))
            vmax = np.percentile(np.abs(curv), 95) + 1e-12
            im = ax.pcolormesh(cgx, cgy, curv, shading="auto", cmap="RdBu_r",
                               vmin=-vmax, vmax=vmax)
            fig.colorbar(im, ax=ax, label="Gaussian curvature (induced 2-D metric)")
            ax.scatter(c_proj[:, 0], c_proj[:, 1], c="k", s=10, marker="x")
            ax.set_title(f"Curvature landscape (epoch {epoch})")
            written.append(self.save_figure(fig, epoch, "curvature"))

        # temporal metric analysis: det G^{-1} along trajectories
        dets = np.asarray(
            log_sqrt_det_g_inv(model.metric, jnp.asarray(flat, jnp.float32))
        ).reshape(z.shape[0], z.shape[1])
        fig, ax = plt.subplots(figsize=(6, 4))
        for i in range(min(8, dets.shape[0])):
            ax.plot(dets[i], "-o", ms=3, alpha=0.7)
        ax.set_xlabel("timestep"), ax.set_ylabel(r"$\log\sqrt{\det G^{-1}(z_t)}$")
        ax.set_title(f"Metric along temporal trajectories (epoch {epoch})")
        written.append(self.save_figure(fig, epoch, "temporal_metric"))
        return written
