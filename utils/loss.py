"""Shim: reference `utils/loss.py` -> mergenet_tpu.ops.losses (JAX
functions; the reference exposed torch Modules — here the loss *classes*
are provided as thin callables with the same constructor surface)."""
from mergenet_tpu.ops.losses import (  # noqa: F401
    bce_with_logits_loss, weighted_bce_with_logits_loss,
    multi_bce_with_logits_loss, soft_dice_loss,
    cross_entropy_one_hot_loss, get_loss_fn)


class CrossEntropyLossOneHot:
    def __init__(self, **kw):
        pass

    def __call__(self, input, target):
        return cross_entropy_one_hot_loss(input, target)


class SoftDiceLoss:
    def __init__(self, mode="1", smooth=1):
        self.mode = mode
        self.smooth = smooth

    def __call__(self, input, target):
        return soft_dice_loss(input, target, mode=self.mode,
                              smooth=self.smooth)


class MultiBCEWithLogitsLoss:
    def __init__(self, **kw):
        pass

    def __call__(self, input, target):
        return multi_bce_with_logits_loss(input, target)


class WeightedBCEWithLogitsLoss:
    def __init__(self, alpha=0.5, **kw):
        self.alpha = alpha

    def __call__(self, input, target):
        return weighted_bce_with_logits_loss(input, target,
                                             alpha=self.alpha)
