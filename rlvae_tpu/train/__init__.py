from rlvae_tpu.train.callbacks import (
    CallbackHandler,
    MetricConsoleLoggerCallback,
    ProgressBarCallback,
    TrainingCallback,
    WandbCallback,
)
from rlvae_tpu.train.checkpoints import CheckpointManager
from rlvae_tpu.train.pipelines import GenerationPipeline, TrainingPipeline
from rlvae_tpu.train.optim import (
    EarlyStopping,
    PlateauScheduler,
    get_lr,
    make_optimizer,
    set_lr,
)
from rlvae_tpu.train.trainer import (
    Trainer,
    make_epoch_fn,
    make_epoch_fn_sharded,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "Trainer",
    "make_train_step",
    "make_epoch_fn",
    "make_epoch_fn_sharded",
    "make_eval_step",
    "make_optimizer",
    "PlateauScheduler",
    "EarlyStopping",
    "get_lr",
    "set_lr",
    "CheckpointManager",
    "TrainingCallback",
    "CallbackHandler",
    "MetricConsoleLoggerCallback",
    "ProgressBarCallback",
    "WandbCallback",
    "TrainingPipeline",
    "GenerationPipeline",
]
