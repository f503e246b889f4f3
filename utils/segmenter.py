"""Shim: reference `utils/segmenter.py` -> mergenet_tpu.decoder.segmenter."""
from mergenet_tpu.decoder.segmenter import (  # noqa: F401
    ObjectSegmenter, SegmenterOptions)
