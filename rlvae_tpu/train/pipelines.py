"""Training / generation pipelines — the pythae pipeline-stack equivalent.

Reimplements the vendored pythae pipeline surface (reference:
src/lib/src/pythae/pipelines/training.py:23-235 ``TrainingPipeline``,
generation.py:23-143 ``GenerationPipeline``) over this framework's compiled
trainer and sampler zoo:

- ``TrainingPipeline(model, training_config)(train_data, eval_data,
  callbacks)`` trains on in-memory arrays, writes a timestamped
  ``training_*/final_model`` directory (checkpoint + model_config.json),
  and returns the trainer result,
- ``GenerationPipeline(model, sampler)(num_samples, ...)`` dispatches to the
  generation sampler registry (normal / vamp / rhvae — the three sampler
  families that exist in the vendored fork) and returns decoded images.

The reference's per-model trainer-config specialization (RAE_L2/VAEGAN
coupled optimizers, training.py:50-100) guards model families that were never
vendored; the checks here stay config-driven instead.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Mapping, Optional, Sequence

import numpy as np

from rlvae_tpu.data.cyclic import CyclicDataModule, CyclicSequenceDataset
from rlvae_tpu.samplers.generation import SAMPLER_REGISTRY, BaseGenerationSampler
from rlvae_tpu.train.trainer import Trainer

DEFAULT_TRAINING_CONFIG: Dict[str, Any] = {
    "trainer": {"max_epochs": 10, "devices": 1, "log_every_n_steps": 10},
    "data": {"batch_size": 8},
    "optimizer": {"lr": 1e-3, "weight_decay": 0.0},
    "scheduler": {"factor": 0.5, "patience": 5, "min_lr": 1e-6},
    "early_stopping": {"patience": 10, "min_delta": 0.0},
}


def _data_module_from_arrays(
    train_data: np.ndarray,
    eval_data: Optional[np.ndarray],
    training_config: Mapping[str, Any],
) -> CyclicDataModule:
    """Build a data module directly from arrays (the reference's
    DataProcessor + BaseDataset step, training.py:105-143): [N,T,C,H,W]
    sequences, or [N,C,H,W] frames lifted to T=1 sequences."""
    train = np.asarray(train_data, np.float32)
    if train.ndim == 4:
        train = train[:, None]
    if train.ndim != 5:
        raise ValueError(
            f"train_data must be [N,T,C,H,W] or [N,C,H,W]; got {train.shape}"
        )
    # the batch size can never exceed the dataset (drop-remainder static
    # shapes would otherwise yield ZERO train batches for tiny arrays)
    batch_size = min(
        int(dict(training_config).get("data", {}).get("batch_size", 8)),
        train.shape[0],
    )
    if eval_data is None:
        # the reference pipeline trains WITHOUT validation when eval_data is
        # None; here early stopping / the 'best' checkpoint need a val set,
        # so the head of the TRAINING data stands in — a leaky signal, so
        # say so (pass a real eval_data to select on held-out loss)
        print(
            "[pipeline] eval_data is None: validating on the head of the "
            "training data (leaky val_loss; 'best' selection favors fit)"
        )
        eval_arr = train[: max(batch_size, train.shape[0] // 10)]
    else:
        eval_arr = np.asarray(eval_data, np.float32)
        if eval_arr.ndim == 4:
            eval_arr = eval_arr[:, None]
        if eval_arr.ndim != 5 or eval_arr.shape[0] == 0:
            raise ValueError(
                "eval_data must be a non-empty [N,T,C,H,W] or [N,C,H,W] "
                f"array; got {eval_arr.shape}"
            )
    # multi-host: each process keeps only its strided TRAIN shard (same
    # slicing as CyclicDataModule.setup) — the sharded-epoch staging path
    # uploads each host's local rows as disjoint pieces of the global array,
    # so an unsharded assignment would duplicate every sequence per host.
    # Eval stays host-replicated (same val_loss on every host).
    import jax

    pc = jax.process_count()
    if pc > 1:
        per_host = train.shape[0] // pc
        train = train[jax.process_index() :: pc][:per_host]
        batch_size = min(batch_size, max(1, train.shape[0]))
    if eval_arr.shape[0] < batch_size:
        # tile up to one full batch, or evaluation would yield zero batches
        # under drop-remainder static shapes (val_loss NaN -> the 'best'
        # checkpoint is never written)
        reps = -(-batch_size // eval_arr.shape[0])
        eval_arr = np.tile(eval_arr, (reps, 1, 1, 1, 1))[:batch_size]
    dm = CyclicDataModule({"synthetic_fallback": False, "verify_cyclicity": False})
    dm.batch_size = batch_size
    dm.train = CyclicSequenceDataset(train, verify_cyclicity=False)
    dm.val = CyclicSequenceDataset(eval_arr, verify_cyclicity=False)
    dm.test = CyclicSequenceDataset(eval_arr, verify_cyclicity=False)
    return dm


class TrainingPipeline:
    """End-to-end training over raw arrays (reference training.py:23-235)."""

    def __init__(
        self,
        model,
        training_config: Optional[Mapping[str, Any]] = None,
        output_dir: str | Path = "outputs/pipelines",
    ):
        self.model = model
        cfg = {k: (dict(v) if isinstance(v, dict) else v) for k, v in DEFAULT_TRAINING_CONFIG.items()}
        for k, v in dict(training_config or {}).items():
            if isinstance(v, Mapping) and isinstance(cfg.get(k), dict):
                cfg[k].update(v)
            else:
                cfg[k] = v
        self.training_config = cfg
        self.output_dir = Path(output_dir)
        self.trainer: Optional[Trainer] = None

    def __call__(
        self,
        train_data,
        eval_data=None,
        callbacks: Optional[Sequence] = None,
    ) -> Dict[str, Any]:
        dm = _data_module_from_arrays(train_data, eval_data, self.training_config)
        # reference: a training_YYYY-MM-DD_hh-mm-ss folder per run
        # (training.py docstring); final model lands in final_model/
        stamp = time.strftime("training_%Y-%m-%d_%H-%M-%S")
        run_dir = self.output_dir / stamp
        self.trainer = Trainer(
            self.model,
            dm,
            self.training_config,
            run_dir=run_dir,
            callbacks=list(callbacks or []),
        )
        result = self.trainer.fit()
        final_dir = run_dir / "final_model"
        final_dir.mkdir(parents=True, exist_ok=True)
        summary = {}
        if hasattr(self.model, "get_model_summary"):
            summary = dict(self.model.get_model_summary())
        (final_dir / "model_config.json").write_text(json.dumps(summary, default=str))
        # final weights live IN final_model/ (the documented pythae-style
        # layout: checkpoint + model_config.json side by side)
        from rlvae_tpu.train.checkpoints import CheckpointManager

        final_ckpt = CheckpointManager(final_dir)
        final_ckpt.save(
            "weights", {"variables": result["variables"], "step": result["steps"]}
        )
        final_ckpt.wait()
        result["run_dir"] = str(run_dir)
        return result


class GenerationPipeline:
    """End-to-end sampling from a trained model (reference generation.py:23-143).

    ``sampler`` is a registry name ('normal' | 'vamp' | 'rhvae'), an already
    constructed :class:`BaseGenerationSampler`, or None (-> normal prior,
    matching the reference default).
    """

    def __init__(
        self,
        model,
        variables: Optional[Dict[str, Any]] = None,
        sampler: str | BaseGenerationSampler | None = None,
        **sampler_kwargs,
    ):
        if isinstance(sampler, BaseGenerationSampler):
            self.sampler = sampler
        else:
            name = sampler or "normal"
            if name not in SAMPLER_REGISTRY:
                raise NotImplementedError(
                    f"Unrecognized sampler '{name}'. Available: {sorted(SAMPLER_REGISTRY)}"
                )
            self.sampler = SAMPLER_REGISTRY[name](model, variables, **sampler_kwargs)

    def __call__(
        self,
        num_samples: int = 1,
        batch_size: int = 500,
        output_dir: Optional[str | Path] = None,
        return_gen: bool = True,
        save_sampler_config: bool = False,
        train_data=None,
        eval_data=None,
        training_config=None,
        seed: int = 0,
    ):
        self.sampler.fit(
            train_data=train_data, eval_data=eval_data, training_config=training_config
        )
        return self.sampler.sample(
            num_samples=num_samples,
            batch_size=batch_size,
            output_dir=output_dir,
            return_gen=return_gen,
            save_sampler_config=save_sampler_config,
            seed=seed,
        )
