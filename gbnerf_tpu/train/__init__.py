from .state import TrainState, create_train_state, build_field, make_optimizer
from .step import (make_render_fn, render_image, make_image_renderer,
                   make_train_step_stage1,
                   make_train_step_stage2, select_stage2_view, Stage2Batch)
from .checkpoint import CheckpointManager
from .eval import render_pose_path, save_video, dump_eval_images
from .loop import train

__all__ = [
    "TrainState", "create_train_state", "build_field", "make_optimizer",
    "make_render_fn", "render_image", "make_train_step_stage1",
    "make_train_step_stage2", "select_stage2_view", "Stage2Batch",
    "CheckpointManager", "render_pose_path", "save_video", "dump_eval_images",
    "train",
]
