"""Training runtime: losses, SPMD step, checkpointing, CLI loop."""

from geocalib_tpu.training.checkpoint import ExperimentManager
from geocalib_tpu.training.train_step import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_optimizer,
    make_schedule,
    make_sharded_train_step,
    train_step,
)

__all__ = [
    "ExperimentManager",
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_schedule",
    "make_sharded_train_step",
    "train_step",
]
