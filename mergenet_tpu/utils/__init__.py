from .train_utils import (train, validate, sample, save_checkpoint,
                          AverageMeter, generate_offsets)
from .inference_utils import class_inference, offset_inference, save
from ..ops.metrics import runningScore, offsetIoU
from ..decoder import ObjectSegmenter, SegmenterOptions

__all__ = [
    "train", "validate", "sample", "save_checkpoint", "AverageMeter",
    "generate_offsets", "class_inference", "offset_inference", "save",
    "runningScore", "offsetIoU", "ObjectSegmenter", "SegmenterOptions",
]
