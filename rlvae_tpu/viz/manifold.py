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

        # enhanced manifold heatmaps (reference: manifold.py:262-366): one
        # column per shown timestep — flow-evolved latents over the local
        # sqrt(det G^{-1}) field in the timestep's own PCA neighborhood
        t_show = list(range(0, z.shape[1], max(1, z.shape[1] // 4)))[:4]
        fig, axes = plt.subplots(
            2, len(t_show), figsize=(4 * len(t_show), 7.5), squeeze=False
        )
        for col, t in enumerate(t_show):
            zt = z_proj.reshape(z.shape[0], z.shape[1], 2)[:, t]
            ax0 = axes[0, col]
            ax0.pcolormesh(gx, gy, vals, shading="auto", cmap="viridis", alpha=0.85)
            ax0.scatter(zt[:, 0], zt[:, 1], c="white", s=22, edgecolors="k")
            ax0.set_title(f"Flow-evolved coords t={t}")
            ax0.set_xticks([]), ax0.set_yticks([])
            ax1 = axes[1, col]
            ax1.hist(dets[:, t], bins=10, alpha=0.8, color="tab:purple")
            ax1.set_title(f"$\\log\\sqrt{{\\det G^{{-1}}}}$ at t={t}")
        fig.suptitle(f"Enhanced manifold heatmaps (epoch {epoch})")
        fig.tight_layout()
        written.append(self.save_figure(fig, epoch, "enhanced_heatmaps"))

        # temporal metric analysis 2x2 (reference: manifold.py:367-470):
        # mean det / condition number / eigenvalue spread / trace over time
        from rlvae_tpu.geometry import g_inv as _g_inv

        gi = np.asarray(_g_inv(model.metric, jnp.asarray(flat, jnp.float32)))
        eig = np.linalg.eigvalsh(gi).reshape(z.shape[0], z.shape[1], -1)
        cond = eig[..., -1] / np.maximum(eig[..., 0], 1e-12)
        trace = np.trace(gi, axis1=-2, axis2=-1).reshape(z.shape[0], z.shape[1])
        fig, axes = plt.subplots(2, 2, figsize=(12, 8))
        axes[0, 0].plot(dets.mean(0), "o-")
        axes[0, 0].fill_between(
            np.arange(dets.shape[1]),
            dets.mean(0) - dets.std(0), dets.mean(0) + dets.std(0), alpha=0.3,
        )
        axes[0, 0].set_title(r"Mean $\log\sqrt{\det G^{-1}}$ evolution")
        axes[0, 1].semilogy(cond.mean(0), "o-", color="tab:orange")
        axes[0, 1].set_title("Condition number evolution")
        axes[1, 0].semilogy(eig[..., -1].mean(0), "o-", label=r"$\lambda_{max}$")
        axes[1, 0].semilogy(eig[..., 0].mean(0), "o-", label=r"$\lambda_{min}$")
        axes[1, 0].set_title("Eigenvalue spread of $G^{-1}(z_t)$")
        axes[1, 0].legend()
        axes[1, 1].plot(trace.mean(0), "o-", color="tab:green")
        axes[1, 1].set_title(r"Mean $\mathrm{tr}\,G^{-1}(z_t)$")
        for ax_ in axes.ravel():
            ax_.set_xlabel("timestep")
        fig.suptitle(f"Temporal metric analysis (epoch {epoch})")
        fig.tight_layout()
        written.append(self.save_figure(fig, epoch, "temporal_metric_analysis"))
        return written
