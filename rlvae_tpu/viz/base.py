"""Shared visualization helpers (reference: src/visualizations/base.py:16-95):
output-path management, safe matplotlib saving, wandb gating, PCA prep."""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import numpy as np


class SharedForward:
    """One jitted forward + one per-epoch result shared by every viz module.

    All modules call ``forward(model, variables, x, PRNGKey(epoch))`` with
    identical arguments inside one ``visualize_epoch``, so without sharing
    each enabled module would pay its own compile AND its own device
    dispatch of the same program every viz epoch (4x at the full level).
    The manager resets the memo at the start of each epoch."""

    def __init__(self):
        self._jit = None
        self._memo = None

    def reset(self) -> None:
        self._memo = None

    def __call__(self, model, variables, x, key):
        import jax
        import jax.numpy as jnp

        if self._memo is None:
            if self._jit is None:
                self._jit = jax.jit(lambda v, xx, k: model.forward(v, xx, k))
            self._memo = self._jit(variables, jnp.asarray(x), key)
        return self._memo


class BaseVisualization:
    def __init__(self, config, output_dir: Path, logger=None):
        self.config = config
        self.output_dir = Path(output_dir)
        self.logger = logger
        self._forward = SharedForward()  # replaced by the manager's shared one

    def forward(self, model, variables, x, key):
        """Model forward through the (manager-)shared jitted+memoized path."""
        return self._forward(model, variables, x, key)

    def _path(self, epoch: int, name: str, ext: str = "png") -> Path:
        d = self.output_dir / f"epoch_{epoch:03d}"
        d.mkdir(parents=True, exist_ok=True)
        return d / f"{name}.{ext}"

    def save_figure(self, fig, epoch: int, name: str) -> Optional[Path]:
        """Save + optionally log a matplotlib figure; never raises."""
        import matplotlib

        matplotlib.use("Agg")
        path = self._path(epoch, name)
        try:
            fig.savefig(path, dpi=100, bbox_inches="tight")
        finally:
            import matplotlib.pyplot as plt

            plt.close(fig)
        if self.logger is not None and getattr(self.config, "log_to_wandb", False):
            self.logger.log_image(f"viz/{name}", path)
        return path

    @staticmethod
    def pca_fit_transform(z: np.ndarray, n_components: int = 2):
        """PCA projection (sklearn when available, numpy SVD otherwise)."""
        z = np.asarray(z, np.float64)
        flat = z.reshape(-1, z.shape[-1])
        try:
            from sklearn.decomposition import PCA

            pca = PCA(n_components=n_components)
            proj = pca.fit_transform(flat)
            return proj.reshape(*z.shape[:-1], n_components), pca
        except ImportError:
            mean = flat.mean(0)
            u, s, vt = np.linalg.svd(flat - mean, full_matrices=False)
            comp = vt[:n_components]
            proj = (flat - mean) @ comp.T
            return proj.reshape(*z.shape[:-1], n_components), (mean, comp)

    def run(self, epoch: int, model, variables, sample_batch) -> List[Path]:
        raise NotImplementedError


def png_b64(frame_chw) -> str:
    """[C, H, W] float array -> base64 PNG thumbnail, rendered directly from
    the pixel array (no matplotlib figure — ~50x cheaper per frame; shared
    by the interactive viz suites and the app server)."""
    import base64
    import io

    import matplotlib
    import numpy as np

    matplotlib.use("Agg")
    from matplotlib import image as mpimg

    arr = np.clip(np.transpose(np.asarray(frame_chw), (1, 2, 0)), 0.0, 1.0)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    buf = io.BytesIO()
    mpimg.imsave(buf, arr, format="png")
    return base64.b64encode(buf.getvalue()).decode()
