from .optimizers import make_gaussian_optimizer
from .trainer import TrainConfig, Trainer, TrainState, init_train_state, make_train_step

__all__ = [
    "make_gaussian_optimizer",
    "TrainConfig",
    "Trainer",
    "TrainState",
    "init_train_state",
    "make_train_step",
]
