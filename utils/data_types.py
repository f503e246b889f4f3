"""Shim: reference `utils/data_types.py` -> mergenet_tpu.core.types."""
from mergenet_tpu.core.types import (  # noqa: F401
    validate_config, validate_image_with_mask, validate_combined_image)
