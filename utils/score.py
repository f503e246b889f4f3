"""Shim: reference `utils/score.py` -> mergenet_tpu.ops.metrics."""
from mergenet_tpu.ops.metrics import runningScore, offsetIoU  # noqa: F401
