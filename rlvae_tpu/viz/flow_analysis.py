"""Flow analysis: det G along flow-evolved latents + per-timestep flow
Jacobian spectra (reference: src/visualizations/flow_analysis.py:29-380).

Jacobians of the D=16 flows come from ``jax.jacfwd`` over the IAF forward —
cheap at this dimensionality and exact, replacing the reference's per-sample
torch autograd loops.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from rlvae_tpu.viz.base import BaseVisualization


class FlowAnalysisVisualizations(BaseVisualization):
    def _flow_animation(self, epoch, model, z, spectra):
        """Timestep-slider animation of the flow's spatial evolution with
        det-G coloring + per-flow spectral summary (reference:
        flow_analysis.py:382-530, plotly animation -> dependency-free HTML)."""
        import base64
        import io
        import json

        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from rlvae_tpu.geometry import log_sqrt_det_g_inv
        from rlvae_tpu.viz.interactive import _SLIDER_HTML

        flat = z.reshape(-1, z.shape[-1])
        proj, _ = self.pca_fit_transform(flat)
        z2 = proj.reshape(z.shape[0], z.shape[1], 2)
        dets = np.asarray(
            log_sqrt_det_g_inv(model.metric, jnp.asarray(flat, jnp.float32))
        ).reshape(z.shape[0], z.shape[1])
        rad = [float(s[0]) for s in spectra]  # spectral radius per flow

        frames = []
        for t in range(z.shape[1]):
            fig, (a0, a1, a2) = plt.subplots(1, 3, figsize=(10, 3), dpi=64)
            sc = a0.scatter(z2[:, t, 0], z2[:, t, 1], c=dets[:, t], cmap="viridis", s=28)
            for i in range(min(6, z2.shape[0])):
                a0.plot(z2[i, : t + 1, 0], z2[i, : t + 1, 1], "-", alpha=0.4, lw=1)
            fig.colorbar(sc, ax=a0)
            a0.set_title(f"flow spatial evolution t={t}", fontsize=8)
            a1.plot(dets.T, alpha=0.5)
            a1.axvline(t, color="red")
            a1.set_title(r"$\log\sqrt{\det G^{-1}}$ evolution", fontsize=8)
            a2.bar(np.arange(len(rad)), rad, alpha=0.8)
            if t > 0 and t - 1 < len(rad):
                a2.bar([t - 1], [rad[t - 1]], color="red")
            a2.set_title("flow spectral radius (red = active)", fontsize=8)
            buf = io.BytesIO()
            fig.savefig(buf, format="png", bbox_inches="tight")
            plt.close(fig)
            frames.append(base64.b64encode(buf.getvalue()).decode())
        html = _SLIDER_HTML.format(
            title=f"Flow evolution animation (epoch {epoch})",
            tmax=len(frames) - 1,
            data_json=json.dumps([frames]),
        )
        path = self._path(epoch, "flow_animation", ext="html")
        path.write_text(html)
        return path

    def run(self, epoch: int, model, variables, sample_batch) -> List:
        if model.n_flows == 0:
            return []
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from rlvae_tpu.flows import iaf_forward, iaf_inverse

        # mirror the temporal map's configured direction (flow_direction=
        # 'sampling' runs iaf_inverse as the forward-time map,
        # flows/temporal.py); otherwise the spectra describe the inverse
        step_fn = (iaf_inverse
                   if getattr(model.flow_config, "direction", "density") != "density"
                   else iaf_forward)

        x = np.asarray(sample_batch, np.float32)
        out = self.forward(model, variables, x, jax.random.PRNGKey(epoch))
        z = np.asarray(out.z)  # [B, T, D]
        written = []
        flows = variables["params"]["flows"]
        masks = model.flow_config.masks

        # per-timestep flow Jacobian singular-value spectra
        n_t = min(z.shape[1] - 1, len(flows))
        spectra = []
        for t in range(n_t):
            z_t = jnp.asarray(z[:4, t])  # a few samples

            def f(single):
                y, _ = step_fn(flows[t], masks, single[None, :])
                return y[0]

            jac = jax.vmap(jax.jacfwd(f))(z_t)  # [4, D, D]
            s = np.linalg.svd(np.asarray(jac), compute_uv=False)
            spectra.append(s.mean(axis=0))

        fig, ax = plt.subplots(figsize=(6, 4))
        for t, s in enumerate(spectra):
            ax.semilogy(s, "-o", ms=3, label=f"flow {t}", alpha=0.8)
        ax.set_xlabel("singular value index"), ax.set_ylabel("singular value")
        ax.set_title(f"Flow Jacobian spectra (epoch {epoch})")
        ax.legend(fontsize=7, ncol=2)
        written.append(self.save_figure(fig, epoch, "flow_jacobians"))

        # flow interactive animation (reference: flow_analysis.py:382-530):
        # a timestep slider over [PCA scatter colored by det | det evolution
        # | Jacobian spectral radius], self-contained HTML
        if model.metric is not None:
            written.append(self._flow_animation(epoch, model, z, spectra))

        # det G^{-1} evolution along the flow (when a metric exists)
        if model.metric is not None:
            from rlvae_tpu.geometry import logdet_g_inv

            ld = np.asarray(
                logdet_g_inv(model.metric, jnp.asarray(z.reshape(-1, z.shape[-1])))
            ).reshape(z.shape[0], z.shape[1])
            fig, ax = plt.subplots(figsize=(6, 4))
            ax.plot(ld.mean(0), "-o", label="mean")
            ax.fill_between(
                np.arange(ld.shape[1]),
                ld.mean(0) - ld.std(0),
                ld.mean(0) + ld.std(0),
                alpha=0.3,
            )
            ax.set_xlabel("timestep"), ax.set_ylabel(r"$\log\det G^{-1}(z_t)$")
            ax.set_title(f"Metric determinant along flows (epoch {epoch})")
            ax.legend()
            written.append(self.save_figure(fig, epoch, "flow_det_evolution"))
        return written
