"""Shim: reference `utils/dataset.py` -> mergenet_tpu.data.dataset."""
from mergenet_tpu.data.dataset import (  # noqa: F401
    AllDataset, OffsetDataset, ClassDataset, COCOTestset, DataLoader,
    anns_to_mask, anns_to_mask_class, ann_to_rle, resize_image_and_mask,
    crop_image_and_mask, crop_image_and_target)
from mergenet_tpu.data import COCODataset  # noqa: F401
