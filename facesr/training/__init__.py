"""Training runtime: sharded Trainer, steps, schedules, callbacks, search."""

from facesr.training.trainer import (
    Trainer,
    TrainerConfig,
    EarlyStopping,
    overfit_test,
    save_validation_grid,
)
from facesr.training.steps import (
    TrainState,
    make_train_step,
    make_gan_train_step,
    make_eval_step,
    make_optimizer,
    set_learning_rate,
)
from facesr.training import schedules

__all__ = [
    "Trainer",
    "TrainerConfig",
    "EarlyStopping",
    "overfit_test",
    "save_validation_grid",
    "TrainState",
    "make_train_step",
    "make_gan_train_step",
    "make_eval_step",
    "make_optimizer",
    "set_learning_rate",
    "schedules",
]
