from .optimizer import build_optimizer, cosine_schedule
from .state import TrainState, create_train_state
from .step import make_train_step

__all__ = [
    "build_optimizer",
    "cosine_schedule",
    "TrainState",
    "create_train_state",
    "make_train_step",
]
