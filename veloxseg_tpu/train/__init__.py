from .loss import CompositeLoss, dice_loss, softmax_ce_loss
from .optim import build_optimizer, build_lr_schedule
from .metrics import segmentation_metrics, deep_metrics
from .metrics_brats import brats_dice
from .train_state import TrainState, create_train_state, train_step_fn

__all__ = [
    "CompositeLoss", "dice_loss", "softmax_ce_loss", "build_optimizer",
    "build_lr_schedule", "segmentation_metrics", "deep_metrics",
    "brats_dice", "TrainState", "create_train_state", "train_step_fn",
]
