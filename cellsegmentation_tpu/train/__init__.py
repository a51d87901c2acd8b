from cellsegmentation_tpu.train.state import (
    MILTrainState,
    create_train_state,
    stage_trainable_partitions,
)
from cellsegmentation_tpu.train.schedules import make_schedule
from cellsegmentation_tpu.train import steps, checkpoint

__all__ = [
    "MILTrainState",
    "create_train_state",
    "stage_trainable_partitions",
    "make_schedule",
    "steps",
    "checkpoint",
]
