"""Training callback system — the pythae trainer-stack equivalent.

Reimplements the vendored pythae callback surface (reference:
src/lib/src/pythae/trainers/training_callbacks.py:42-379 — ``TrainingCallback``
with its hook set, ``CallbackHandler`` dispatch, ``ProgressBarCallback``,
``MetricConsoleLoggerCallback``, ``WandbCallback``/``MLFlowCallback``) as a
thin host-side layer over this framework's compiled training loop.

TPU-first note: hooks run on the HOST between compiled dispatches — a
callback never enters jit-land.  ``on_train_step_end`` therefore fires at
the trainer's log cadence (``log_every_n_steps``), with the fetched metric
dict, on BOTH training paths: forcing a device fetch every step would
serialize the pipeline (per-step loop) or is impossible mid-epoch
(whole-epoch-compiled path, one dispatch per epoch).  ``on_train_step_begin``
fires every step on the per-step loop only; eval-step hooks fire per
evaluation batch.
"""

from __future__ import annotations

import sys
import time
from typing import Any, Dict, Iterable, List, Optional


class TrainingCallback:
    """Base class; subclasses override any subset of the hooks.

    Hook names mirror the reference's (training_callbacks.py:42-116); every
    hook receives the training config dict plus keyword context.
    """

    def on_init_end(self, training_config: Dict[str, Any], **kwargs):
        pass

    def on_train_begin(self, training_config: Dict[str, Any], **kwargs):
        pass

    def on_train_end(self, training_config: Dict[str, Any], **kwargs):
        pass

    def on_epoch_begin(self, training_config: Dict[str, Any], **kwargs):
        pass

    def on_epoch_end(self, training_config: Dict[str, Any], **kwargs):
        pass

    def on_train_step_begin(self, training_config: Dict[str, Any], **kwargs):
        pass

    def on_train_step_end(self, training_config: Dict[str, Any], **kwargs):
        pass

    def on_eval_step_begin(self, training_config: Dict[str, Any], **kwargs):
        pass

    def on_eval_step_end(self, training_config: Dict[str, Any], **kwargs):
        pass

    def on_evaluate(self, training_config: Dict[str, Any], **kwargs):
        pass

    def on_prediction_step(self, training_config: Dict[str, Any], **kwargs):
        pass

    def on_save(self, training_config: Dict[str, Any], **kwargs):
        pass

    def on_log(self, training_config: Dict[str, Any], logs: Dict[str, Any], **kwargs):
        pass


class CallbackHandler:
    """Dispatches one event to every registered callback (reference
    training_callbacks.py:119-187)."""

    def __init__(self, callbacks: Optional[Iterable[TrainingCallback]] = None):
        self.callbacks: List[TrainingCallback] = list(callbacks or [])

    def add_callback(self, callback: TrainingCallback) -> None:
        if any(type(cb) is type(callback) for cb in self.callbacks):
            # same de-dup rule as the reference handler
            return
        self.callbacks.append(callback)

    def __iter__(self):
        return iter(self.callbacks)

    def call_event(self, event: str, training_config: Dict[str, Any], **kwargs):
        for cb in self.callbacks:
            getattr(cb, event)(training_config, **kwargs)

    # convenience wrappers so call sites read like the reference's
    def on_init_end(self, training_config, **kw):
        self.call_event("on_init_end", training_config, **kw)

    def on_train_begin(self, training_config, **kw):
        self.call_event("on_train_begin", training_config, **kw)

    def on_train_end(self, training_config, **kw):
        self.call_event("on_train_end", training_config, **kw)

    def on_epoch_begin(self, training_config, **kw):
        self.call_event("on_epoch_begin", training_config, **kw)

    def on_epoch_end(self, training_config, **kw):
        self.call_event("on_epoch_end", training_config, **kw)

    def on_train_step_end(self, training_config, **kw):
        self.call_event("on_train_step_end", training_config, **kw)

    def on_evaluate(self, training_config, **kw):
        self.call_event("on_evaluate", training_config, **kw)

    def on_save(self, training_config, **kw):
        self.call_event("on_save", training_config, **kw)

    def on_log(self, training_config, logs, **kw):
        self.call_event("on_log", training_config, logs=logs, **kw)


class MetricConsoleLoggerCallback(TrainingCallback):
    """Epoch-level console metric lines (reference training_callbacks.py:190-229)."""

    def __init__(self, stream=None):
        self.stream = stream or sys.stderr

    def on_epoch_end(self, training_config, **kwargs):
        epoch = kwargs.get("epoch")
        logs = kwargs.get("logs", {})
        parts = ", ".join(
            f"{k}={v:.4f}" for k, v in logs.items() if isinstance(v, (int, float))
        )
        print(f"[epoch {epoch}] {parts}", file=self.stream, flush=True)


class ProgressBarCallback(TrainingCallback):
    """Dependency-free progress reporting (the reference uses tqdm,
    training_callbacks.py:232-273; tqdm-free here by design)."""

    def __init__(self, stream=None):
        self.stream = stream or sys.stderr
        self._epoch_start = 0.0
        self._max_epochs = 0

    def on_train_begin(self, training_config, **kwargs):
        trainer_cfg = training_config.get("trainer", {})
        self._max_epochs = int(trainer_cfg.get("max_epochs", 0))

    def on_epoch_begin(self, training_config, **kwargs):
        self._epoch_start = time.time()

    def on_epoch_end(self, training_config, **kwargs):
        epoch = kwargs.get("epoch", 0)
        dt = time.time() - self._epoch_start
        total = self._max_epochs or "?"
        print(
            f"epoch {epoch + 1}/{total} done in {dt:.2f}s",
            file=self.stream,
            flush=True,
        )


class WandbCallback(TrainingCallback):
    """W&B logging, host-0 only; degrades to a no-op when wandb is absent
    (reference training_callbacks.py:276-379; this environment has no wandb,
    so setup() reports unavailability instead of raising)."""

    def __init__(self):
        self._wandb = None
        self.is_available = False
        try:  # pragma: no cover - wandb not installed here
            import wandb

            self._wandb = wandb
            self.is_available = True
        except Exception:
            pass

    def setup(self, training_config, model_config=None, project_name="rlvae_tpu"):
        if not self.is_available:
            return False
        import jax

        if jax.process_index() != 0:
            return False
        self._run = self._wandb.init(project=project_name, config=dict(training_config))
        if model_config is not None:
            self._wandb.config.update({"model": dict(model_config)})
        return True

    def on_log(self, training_config, logs, **kwargs):
        if self.is_available and getattr(self, "_run", None) is not None:
            self._wandb.log(logs)

    def on_train_end(self, training_config, **kwargs):
        if self.is_available and getattr(self, "_run", None) is not None:
            self._wandb.finish()
