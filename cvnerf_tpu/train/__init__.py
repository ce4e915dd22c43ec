"""Training: state, jitted step, host loop, checkpointing."""

from cvnerf_tpu.train.state import TrainState, create_train_state, make_lr_schedule
from cvnerf_tpu.train.loop import TrainConfig, make_train_step, Trainer

__all__ = [
    "TrainState",
    "create_train_state",
    "make_lr_schedule",
    "TrainConfig",
    "make_train_step",
    "Trainer",
]
