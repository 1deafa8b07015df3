"""Optimizer + LR scheduling.

Matches the reference's optimization recipe (reference:
lightning_trainer.py:201-248 configure_optimizers): torch-style Adam with
coupled L2 weight decay (decay added to gradients *before* the Adam moments —
``torch.optim.Adam(weight_decay=...)`` semantics, not AdamW), and a
ReduceLROnPlateau equivalent driven from epoch-end validation loss.

The learning rate is an injected hyperparameter so plateau reductions mutate
the opt_state without recompiling the jitted train step.
"""

from __future__ import annotations

from typing import Any, Mapping

import optax


def make_optimizer(learning_rate: float, weight_decay: float = 0.0):
    @optax.inject_hyperparams
    def opt(learning_rate):
        return optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.scale_by_adam(),
            optax.scale(-1.0 * learning_rate),
        )

    return opt(learning_rate)


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    # keep the leaf an ARRAY: a Python float would re-trace the jitted
    # epoch/step function on every LR change (weak-typed scalar constant)
    import jax.numpy as jnp

    old = opt_state.hyperparams["learning_rate"]
    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        lr, dtype=getattr(old, "dtype", jnp.float32)
    )
    return opt_state


class PlateauScheduler:
    """Host-side ReduceLROnPlateau (torch semantics with relative threshold)."""

    def __init__(
        self,
        mode: str = "min",
        factor: float = 0.5,
        patience: int = 10,
        threshold: float = 1e-4,
        min_lr: float = 0.0,
    ):
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best: float | None = None
        self.num_bad = 0

    @classmethod
    def from_config(cls, cfg: Mapping[str, Any]) -> "PlateauScheduler":
        return cls(
            mode=str(cfg.get("mode", "min")),
            factor=float(cfg.get("factor", 0.5)),
            patience=int(cfg.get("patience", 10)),
            threshold=float(cfg.get("threshold", 1e-4)),
            min_lr=float(cfg.get("min_lr", 0.0)),
        )

    def _is_better(self, value: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return value < self.best * (1.0 - self.threshold)
        return value > self.best * (1.0 + self.threshold)

    def step(self, value: float, current_lr: float) -> float:
        """Returns the (possibly reduced) learning rate."""
        if self._is_better(value):
            self.best = value
            self.num_bad = 0
            return current_lr
        self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            return max(current_lr * self.factor, self.min_lr)
        return current_lr


class EarlyStopping:
    """Patience-based early stopping on a monitored metric (reference:
    run_experiment.py:267-273 EarlyStopping callback config)."""

    def __init__(self, patience: int = 10, min_delta: float = 0.0, mode: str = "min"):
        self.patience = patience
        self.min_delta = min_delta
        self.mode = mode
        self.best: float | None = None
        self.num_bad = 0

    @classmethod
    def from_config(cls, cfg: Mapping[str, Any]) -> "EarlyStopping":
        return cls(
            patience=int(cfg.get("patience", 10)),
            min_delta=float(cfg.get("min_delta", 0.0)),
            mode=str(cfg.get("mode", "min")),
        )

    def update(self, value: float) -> bool:
        """Returns True when training should stop."""
        improved = (
            self.best is None
            or (self.mode == "min" and value < self.best - self.min_delta)
            or (self.mode == "max" and value > self.best + self.min_delta)
        )
        if improved:
            self.best = value
            self.num_bad = 0
        else:
            self.num_bad += 1
        return self.num_bad >= self.patience
