"""Shim: reference `utils/core_config.py` -> mergenet_tpu.core.config."""
from mergenet_tpu.core.config import CoreConfig  # noqa: F401
