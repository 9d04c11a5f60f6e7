from hspose_tpu.engine.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from hspose_tpu.engine.optimizer import build_optimizer
from hspose_tpu.engine.schedule import build_schedule, flat_and_anneal_factor
from hspose_tpu.engine.train_step import (
    TrainState,
    build_train_step,
    init_train_state,
    make_train_step,
)

__all__ = [
    "latest_checkpoint", "restore_checkpoint", "save_checkpoint",
    "build_optimizer", "build_schedule", "flat_and_anneal_factor",
    "TrainState", "build_train_step", "init_train_state", "make_train_step",
]
