"""Visualization manager: level system + per-category frequencies.

Mirrors the reference's VisualizationManager design (reference:
src/visualizations/manager.py:21-235): five levels MINIMAL..FULL, per-category
toggles (basic / manifold / interactive / flow) with independent epoch
frequencies, dispatching to category modules at epoch end.  All rendering is
host-side matplotlib on device-fetched arrays; plotly-based interactive
visualizations are gated on plotly availability (not installed here -> HTML
fallbacks are written by the modules themselves).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from pathlib import Path
from typing import Any, List, Mapping


class VisualizationLevel(enum.IntEnum):
    MINIMAL = 0
    BASIC = 1
    STANDARD = 2
    ADVANCED = 3
    FULL = 4

    @classmethod
    def from_name(cls, name: str) -> "VisualizationLevel":
        return cls[str(name).upper()]


@dataclass
class VisualizationConfig:
    level: VisualizationLevel = VisualizationLevel.STANDARD
    frequency: int = 5
    enable_basic: bool = True
    enable_manifold: bool = False
    enable_interactive: bool = False
    enable_flow_analysis: bool = False
    basic_frequency: int = 5
    manifold_frequency: int = 10
    interactive_frequency: int = 20
    flow_frequency: int = 10
    max_sequences: int = 8
    disable_curvature: bool = True
    enable_fancy_plots: bool = False
    save_local: bool = True
    log_to_wandb: bool = True

    @classmethod
    def from_mapping(cls, cfg: Mapping[str, Any]) -> "VisualizationConfig":
        level = VisualizationLevel.from_name(cfg.get("level", "standard"))
        kwargs = {k: cfg[k] for k in cls.__dataclass_fields__ if k in cfg and k != "level"}
        return cls(level=level, **kwargs)


class VisualizationManager:
    """Dispatches category modules per epoch based on level + frequencies."""

    def __init__(
        self,
        config: VisualizationConfig,
        output_dir: str | Path,
        logger=None,
    ):
        self.config = config
        self.output_dir = Path(output_dir)
        self.logger = logger
        self.modules: List[Any] = []
        from rlvae_tpu.viz.base import SharedForward

        self._shared_forward = SharedForward()
        self._build_modules()
        for module, _ in self.modules:
            module._forward = self._shared_forward

    def _build_modules(self) -> None:
        from rlvae_tpu.viz.basic import BasicVisualizations

        cfg, lvl = self.config, self.config.level
        if cfg.enable_basic:
            self.modules.append(
                (BasicVisualizations(cfg, self.output_dir, self.logger), cfg.basic_frequency)
            )
        if cfg.enable_manifold and lvl >= VisualizationLevel.STANDARD:
            from rlvae_tpu.viz.manifold import ManifoldVisualizations

            self.modules.append(
                (ManifoldVisualizations(cfg, self.output_dir, self.logger), cfg.manifold_frequency)
            )
        if cfg.enable_flow_analysis and lvl >= VisualizationLevel.STANDARD:
            from rlvae_tpu.viz.flow_analysis import FlowAnalysisVisualizations

            self.modules.append(
                (FlowAnalysisVisualizations(cfg, self.output_dir, self.logger), cfg.flow_frequency)
            )
        if cfg.enable_interactive and lvl >= VisualizationLevel.ADVANCED:
            from rlvae_tpu.viz.interactive import InteractiveVisualizations

            self.modules.append(
                (
                    InteractiveVisualizations(cfg, self.output_dir, self.logger),
                    cfg.interactive_frequency,
                )
            )

    def visualize_epoch(self, epoch: int, model, variables, sample_batch) -> List[Path]:
        """Run due modules for this epoch; returns written artifact paths."""
        if self.config.frequency <= 0 or epoch % self.config.frequency != 0:
            return []
        # new epoch -> new params: drop the shared memoized forward result
        self._shared_forward.reset()
        written: List[Path] = []
        for module, freq in self.modules:
            if freq > 0 and epoch % freq == 0:
                try:
                    written.extend(module.run(epoch, model, variables, sample_batch) or [])
                except Exception as e:  # viz must never kill training...
                    # ...but failures go through the metrics logger so a
                    # broken category can't fail silently for a whole run
                    msg = f"{type(module).__name__} failed at epoch {epoch}: {e}"
                    if self.logger is not None:
                        self.logger.log({"viz/error": msg, "epoch": epoch})
                    print(f"[viz] WARNING: {msg}")
        return written


def make_viz_hook(
    viz_config: Mapping[str, Any],
    data_module,
    run_dir: str | Path,
    logger=None,
):
    """Build the trainer's epoch-end hook (reference:
    lightning_trainer.py:172-199 on_validation_epoch_end)."""
    if not viz_config:
        return None
    config = VisualizationConfig.from_mapping(viz_config)
    manager = VisualizationManager(config, Path(run_dir) / "visualizations", logger)

    def hook(epoch: int, model, variables, trainer=None):
        sample = data_module.get_sample_batch("val", n=config.max_sequences)
        manager.visualize_epoch(epoch, model, variables, sample)

    return hook
