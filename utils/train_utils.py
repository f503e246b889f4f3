"""Shim: reference `utils/train_utils.py` -> mergenet_tpu.utils.train_utils."""
from mergenet_tpu.utils.train_utils import (  # noqa: F401
    train, validate, sample, save_checkpoint, AverageMeter,
    generate_offsets)
