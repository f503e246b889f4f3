"""Shim: reference `utils/data_io.py` -> mergenet_tpu.data.data_io."""
from mergenet_tpu.data.data_io import (  # noqa: F401
    DataSaver, WaldoDataset, WaldoTestset)
