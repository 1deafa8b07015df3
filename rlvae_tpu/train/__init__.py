from rlvae_tpu.train.checkpoints import CheckpointManager
from rlvae_tpu.train.optim import (
    EarlyStopping,
    PlateauScheduler,
    get_lr,
    make_optimizer,
    set_lr,
)
from rlvae_tpu.train.trainer import Trainer, make_eval_step, make_train_step

__all__ = [
    "Trainer",
    "make_train_step",
    "make_eval_step",
    "make_optimizer",
    "PlateauScheduler",
    "EarlyStopping",
    "get_lr",
    "set_lr",
    "CheckpointManager",
]
