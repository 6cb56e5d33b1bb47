from tti.train.losses import bbox_ciou, dfl_loss, seg_loss
from tti.train.assigner import task_aligned_assign
from tti.train.step import TrainState, create_train_state, train_step

__all__ = [
    "bbox_ciou",
    "dfl_loss",
    "seg_loss",
    "task_aligned_assign",
    "TrainState",
    "create_train_state",
    "train_step",
]
