from rlvae_tpu.viz.manager import (
    VisualizationConfig,
    VisualizationLevel,
    VisualizationManager,
    make_viz_hook,
)

__all__ = [
    "VisualizationConfig",
    "VisualizationLevel",
    "VisualizationManager",
    "make_viz_hook",
]
