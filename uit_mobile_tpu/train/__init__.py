from .steps import (
    TrainState,
    make_train_step,
    make_framewise_train_step,
    make_eval_step,
    make_loss,
    bce_loss,
    LOSS_FACTORIES,
)
from .schedule import cosine_with_warmup

__all__ = [
    "TrainState",
    "make_train_step",
    "make_framewise_train_step",
    "make_eval_step",
    "make_loss",
    "bce_loss",
    "LOSS_FACTORIES",
    "cosine_with_warmup",
]
