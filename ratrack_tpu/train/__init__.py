"""Training: losses, metrics, step functions, driver loop, checkpointing."""

from .losses import track4d_loss, flow_loss, motion_seg_loss, affinity_loss
from .metrics import eval_scene_flow, eval_motion_seg
from .step import (TrainState, make_optimizer, create_train_state,
                   make_train_step, make_eval_step, make_scan_eval_step)

__all__ = [
    "track4d_loss", "flow_loss", "motion_seg_loss", "affinity_loss",
    "eval_scene_flow", "eval_motion_seg",
    "TrainState", "make_optimizer", "create_train_state",
    "make_train_step", "make_eval_step", "make_scan_eval_step",
]
