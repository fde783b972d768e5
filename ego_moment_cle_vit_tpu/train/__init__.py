"""Training engine: train state, optimizer/schedule factory, checkpointing,
Trainer and Evaluator."""

from .state import (
    EMCTrainState,
    create_optimizer,
    create_learning_rate_schedule,
    create_train_state,
    save_checkpoint,
    restore_checkpoint,
    latest_checkpoint_step,
)
from .trainer import Trainer
from .evaluator import Evaluator

__all__ = [
    "EMCTrainState",
    "create_optimizer",
    "create_learning_rate_schedule",
    "create_train_state",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint_step",
    "Trainer",
    "Evaluator",
]
