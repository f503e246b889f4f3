"""Grain-based production input pipeline.

The TPU-native data path (BASELINE.json north star): the host ships
*compact* records — uint8 image, int32 instance mask, int32 class table —
and the `(C + O)`-plane training target is built **on device** inside the
jitted train step (`mergenet_tpu.parallel.train.build_train_step_compact`).
Per 512x512 sample this moves ~1 MB to the device instead of the ~20 MB of
float32 one-hot/sameness planes a host-built target would ship.

Layout:
    CocoInstanceSource  — grain RandomAccessDataSource over a COCO json:
                          index -> {image uint8 (H, W, 3),
                                    mask int32 (H, W),
                                    object_class int32 (MAX_INSTANCES,)}
    RandomCrop          — grain RandomMapTransform: fixed-size crop with
                          zero padding (reference dataset.py:559-585).
    make_train_pipeline — shuffled, cropped, batched grain IterDataset.
"""

import os

import numpy as np

import grain

from .coco import COCO
from .dataset import anns_to_mask, resize_image_and_mask

#: class table capacity per record (instances beyond this are background)
MAX_INSTANCES = 256


class CocoInstanceSource:
    """grain RandomAccessDataSource over a COCO-json instance dataset."""

    def __init__(self, img_dir, annfile, scale=1, limits=None):
        self.img_dir = img_dir
        self.coco = COCO(annfile)
        self.scale = scale
        self.catIds = [0] + self.coco.getCatIds()
        self.ids = list(self.coco.imgs.keys())
        if limits:
            self.ids = self.ids[:limits]

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, index):
        import cv2
        img_id = self.ids[int(index)]
        ann_ids = self.coco.getAnnIds(imgIds=img_id)
        anns = self.coco.loadAnns(ann_ids)
        img_path = self.coco.loadImgs(img_id)[0]["file_name"]
        img = cv2.imread(os.path.join(self.img_dir, img_path))
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        mask, object_class = anns_to_mask(anns, img.shape[0], img.shape[1],
                                          self.catIds)
        if self.scale != 1:
            img, mask = resize_image_and_mask(img, mask, self.scale)
        oc = np.zeros((MAX_INSTANCES,), np.int32)
        n = min(len(object_class), MAX_INSTANCES)
        oc[:n] = object_class[:n]
        # instances beyond capacity fall back to background
        mask = np.where(mask < MAX_INSTANCES, mask, 0)
        return {"image": img.astype(np.uint8),
                "mask": mask.astype(np.int32),
                "object_class": oc}


class RandomCrop(grain.transforms.RandomMap):
    """Fixed-size random crop with centered zero padding when the image is
    smaller than the crop (reference dataset.py:559-585)."""

    def __init__(self, height, width):
        self.height = height
        self.width = width

    def random_map(self, record, rng):
        img = record["image"]
        mask = record["mask"]
        h, w = img.shape[:2]
        if h < self.height:
            diff = self.height - h
            top, bot = diff // 2, diff - diff // 2
            img = np.pad(img, ((top, bot), (0, 0), (0, 0)), "constant")
            mask = np.pad(mask, ((top, bot), (0, 0)), "constant")
        if w < self.width:
            diff = self.width - w
            left, right = diff // 2, diff - diff // 2
            img = np.pad(img, ((0, 0), (left, right), (0, 0)), "constant")
            mask = np.pad(mask, ((0, 0), (left, right)), "constant")
        h, w = img.shape[:2]
        top = rng.integers(0, h - self.height + 1)
        left = rng.integers(0, w - self.width + 1)
        return {"image": img[top:top + self.height,
                             left:left + self.width],
                "mask": mask[top:top + self.height,
                             left:left + self.width],
                "object_class": record["object_class"]}


def make_train_pipeline(img_dir, annfile, batch_size, crop_size,
                        scale=1, limits=None, seed=0, shuffle=True,
                        num_epochs=None, read_threads=2,
                        prefetch_buffer=4, source=None):
    """Build the grain pipeline; returns (iter_dataset, source).

    Iterating yields dicts of stacked numpy arrays:
        image (B, S, S, 3) uint8, mask (B, S, S) int32,
        object_class (B, MAX_INSTANCES) int32
    Feed them to `build_train_step_compact` — normalization and target
    construction happen on device.  Pass `source` to reuse an existing
    CocoInstanceSource across epochs (vary `seed` per epoch for fresh
    shuffles/crops)."""
    if source is None:
        source = CocoInstanceSource(img_dir, annfile, scale=scale,
                                    limits=limits)
    ds = grain.MapDataset.source(source).seed(seed)
    if shuffle:
        ds = ds.shuffle()
    if num_epochs is not None and num_epochs > 1:
        ds = ds.repeat(num_epochs)
    ds = ds.random_map(RandomCrop(crop_size, crop_size))
    ds = ds.batch(batch_size, drop_remainder=True)
    it = ds.to_iter_dataset(
        grain.ReadOptions(num_threads=read_threads,
                          prefetch_buffer_size=prefetch_buffer))
    return it, source
