"""Shim: reference `utils/inference_utils.py` -> mergenet_tpu.utils."""
from mergenet_tpu.utils.inference_utils import (  # noqa: F401
    class_inference, offset_inference, save)
