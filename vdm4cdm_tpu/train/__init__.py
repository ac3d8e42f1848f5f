from .state import TrainState, make_optimizer
from .step import make_train_step, make_eval_step
from .loop import Trainer, TrainConfig

__all__ = [
    "TrainState",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
    "Trainer",
    "TrainConfig",
]
