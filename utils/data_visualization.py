"""Shim: reference `utils/data_visualization.py` -> mergenet_tpu.utils."""
from mergenet_tpu.utils.visualization import visualize_mask  # noqa: F401
