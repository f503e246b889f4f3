from .dataset import (AllDataset, OffsetDataset, ClassDataset, COCOTestset,
                      DataLoader)
from .coco import COCO

# reference recipe compatibility: egs/coco scripts import COCODataset
# (reference `egs/coco/local/train.py:16` — stale name for AllDataset)
COCODataset = AllDataset

__all__ = ["AllDataset", "OffsetDataset", "ClassDataset", "COCOTestset",
           "COCODataset", "DataLoader", "COCO"]
