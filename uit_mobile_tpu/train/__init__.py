from .steps import TrainState, make_train_step, make_eval_step, bce_loss
from .schedule import cosine_with_warmup

__all__ = [
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "bce_loss",
    "cosine_with_warmup",
]
