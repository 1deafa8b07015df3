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
    def run(self, epoch: int, model, variables, sample_batch) -> List:
        if model.n_flows == 0:
            return []
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from rlvae_tpu.flows import iaf_forward

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
                y, _ = iaf_forward(flows[t], masks, single[None, :])
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
