from .targets import mask_to_target, instance_mask_to_class_mask
from .losses import (bce_with_logits_loss, weighted_bce_with_logits_loss,
                     multi_bce_with_logits_loss, soft_dice_loss,
                     cross_entropy_one_hot_loss, fused_class_offset_loss,
                     get_loss_fn)
from .metrics import runningScore, offsetIoU

__all__ = [
    "mask_to_target", "instance_mask_to_class_mask",
    "bce_with_logits_loss", "weighted_bce_with_logits_loss",
    "multi_bce_with_logits_loss", "soft_dice_loss",
    "cross_entropy_one_hot_loss", "fused_class_offset_loss", "get_loss_fn",
    "runningScore", "offsetIoU",
]
