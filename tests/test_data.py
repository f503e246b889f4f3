"""Data-layer tests: RLE codec, COCO json API, COCOeval AP, datasets."""

import json
import os

import numpy as np
import pytest

from mergenet_tpu.data import rle as maskUtils
from mergenet_tpu.data.coco import COCO
from mergenet_tpu.data.cocoeval import COCOeval
from mergenet_tpu.data.dataset import (AllDataset, OffsetDataset,
                                       ClassDataset, DataLoader,
                                       anns_to_mask)


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(10):
        m = (rng.rand(23, 31) > 0.6).astype(np.uint8)
        r = maskUtils.encode(m)
        np.testing.assert_array_equal(maskUtils.decode(r), m)
        assert maskUtils.area(r) == int(m.sum())


def test_rle_known_encoding():
    """Cross-checked against pycocotools: a full-zero and full-one mask."""
    z = np.zeros((4, 4), np.uint8)
    r = maskUtils.encode(z)
    assert maskUtils.area(r) == 0
    o = np.ones((2, 3), np.uint8)
    r = maskUtils.encode(o)
    assert maskUtils.area(r) == 6
    np.testing.assert_array_equal(maskUtils.decode(r), o)


def test_rle_column_major_convention():
    m = np.zeros((3, 3), np.uint8)
    m[0, 1] = 1  # F-order position 3 -> counts [3, 1, 5]
    r = maskUtils.encode(m)
    counts = maskUtils._leb_decode(r["counts"])
    assert counts == [3, 1, 5]


def test_rle_merge_iou():
    a = np.zeros((10, 10), np.uint8)
    a[:5] = 1
    b = np.zeros((10, 10), np.uint8)
    b[3:8] = 1
    ra, rb = maskUtils.encode(a), maskUtils.encode(b)
    u = maskUtils.decode(maskUtils.merge([ra, rb]))
    assert u.sum() == 80
    i = maskUtils.decode(maskUtils.merge([ra, rb], intersect=True))
    assert i.sum() == 20
    iou = maskUtils.iou([ra], [rb])
    np.testing.assert_allclose(iou[0, 0], 20 / 80)


def test_polygon_rasterization():
    # a 4x4 square polygon at (2,2)..(6,6)
    poly = [2, 2, 6, 2, 6, 6, 2, 6]
    rles = maskUtils.frPyObjects([poly], 10, 10)
    m = maskUtils.decode(rles[0])
    assert m[3, 3] == 1 and m[0, 0] == 0
    assert 16 <= m.sum() <= 25  # rasterization convention tolerance


def _make_coco_json(tmp_path, n_imgs=2):
    """Synthetic dataset: each image has two rectangle instances."""
    imgs, anns, cats = [], [], []
    cats = [{"id": 11, "name": "thing"}, {"id": 12, "name": "stuff"}]
    ann_id = 1
    H, W = 32, 48
    for i in range(n_imgs):
        imgs.append({"id": 100 + i, "file_name": "img{}.png".format(i),
                     "height": H, "width": W})
        for k, (cat, box) in enumerate(
                [(11, (4, 4, 10, 8)), (12, (20, 16, 12, 10))]):
            x, y, w, h = box
            m = np.zeros((H, W), np.uint8)
            m[y:y + h, x:x + w] = 1
            r = maskUtils.encode(m)
            anns.append({
                "id": ann_id, "image_id": 100 + i, "category_id": cat,
                "segmentation": {"size": r["size"],
                                 "counts": r["counts"].decode("ascii")},
                "area": int(m.sum()), "iscrowd": 0,
                "bbox": [x, y, w, h],
            })
            ann_id += 1
    path = os.path.join(tmp_path, "ann.json")
    with open(path, "w") as f:
        json.dump({"images": imgs, "annotations": anns,
                   "categories": cats}, f)
    # also write the actual images
    import cv2
    for i in range(n_imgs):
        img = np.full((H, W, 3), 127, np.uint8)
        cv2.imwrite(os.path.join(tmp_path, "img{}.png".format(i)), img)
    return path


def test_coco_api(tmp_path):
    path = _make_coco_json(str(tmp_path))
    coco = COCO(path)
    assert sorted(coco.getImgIds()) == [100, 101]
    assert sorted(coco.getCatIds()) == [11, 12]
    assert coco.getCatIds(catNms=["thing"]) == [11]
    ann_ids = coco.getAnnIds(imgIds=100)
    assert len(ann_ids) == 2
    anns = coco.loadAnns(ann_ids)
    m = coco.annToMask(anns[0])
    assert m.sum() == anns[0]["area"]


def test_cocoeval_perfect_predictions(tmp_path):
    path = _make_coco_json(str(tmp_path))
    coco = COCO(path)
    results = []
    for ann in coco.dataset["annotations"]:
        results.append({
            "image_id": ann["image_id"],
            "category_id": ann["category_id"],
            "segmentation": ann["segmentation"],
            "score": 0.9,
        })
    cocoDt = coco.loadRes(results)
    E = COCOeval(coco, cocoDt, "segm")
    E.evaluate()
    E.accumulate()
    E.summarize()
    assert E.stats[0] > 0.99  # perfect AP


def test_cocoeval_half_predictions(tmp_path):
    path = _make_coco_json(str(tmp_path))
    coco = COCO(path)
    results = []
    for ann in coco.dataset["annotations"]:
        if ann["category_id"] != 11:
            continue  # only predict one of two classes
        results.append({
            "image_id": ann["image_id"],
            "category_id": ann["category_id"],
            "segmentation": ann["segmentation"],
            "score": 0.9,
        })
    cocoDt = coco.loadRes(results)
    E = COCOeval(coco, cocoDt, "segm")
    E.evaluate()
    E.accumulate()
    E.summarize()
    np.testing.assert_allclose(E.stats[0], 0.5, atol=0.02)


def test_all_dataset(tmp_path):
    path = _make_coco_json(str(tmp_path))
    offsets = [(1, 0), (0, 1)]
    ds = AllDataset(str(tmp_path), path, num_classes=3, offset_list=offsets)
    assert len(ds) == 2
    img, target = ds[0]
    assert img.shape == (32, 48, 3)
    assert target.shape == (32, 48, 3 + 2)
    # class planes one-hot
    np.testing.assert_allclose(target[..., :3].sum(-1), 1.0)
    # val mode returns id
    ds_val = AllDataset(str(tmp_path), path, num_classes=3,
                        offset_list=offsets, mode="val")
    img_id, img, target = ds_val[0]
    assert img_id == 100


def test_dataset_crop_and_job_sharding(tmp_path):
    path = _make_coco_json(str(tmp_path))
    ds = AllDataset(str(tmp_path), path, num_classes=3,
                    offset_list=[(1, 0)], crop=True, crop_size=16)
    img, target = ds[0]
    assert img.shape == (16, 16, 3)
    # job sharding splits ids disjointly
    ds1 = AllDataset(str(tmp_path), path, num_classes=3,
                     offset_list=[(1, 0)], job=1, num_jobs=2)
    ds2 = AllDataset(str(tmp_path), path, num_classes=3,
                     offset_list=[(1, 0)], job=2, num_jobs=2)
    assert set(ds1.ids).isdisjoint(ds2.ids)
    assert len(ds1) + len(ds2) == 2


def test_offset_and_class_datasets(tmp_path):
    path = _make_coco_json(str(tmp_path))
    ds = OffsetDataset(str(tmp_path), path, offset_list=[(1, 0), (0, 1)])
    img, target = ds[0]
    assert target.shape == (32, 48, 2)
    ds = ClassDataset(str(tmp_path), path)
    img, target = ds[0]
    assert target.shape == (32, 48, 3)
    ds = ClassDataset(str(tmp_path), path, caffe=True)
    img, _ = ds[0]
    # mean-subtracted BGR x256 range: pixel 127 -> [127-mB, 127-mG, 127-mR]
    np.testing.assert_allclose(
        img[0, 0], [127 - 103.939, 127 - 116.779, 127 - 123.68], atol=1e-3)


def test_dataloader(tmp_path):
    path = _make_coco_json(str(tmp_path))
    ds = AllDataset(str(tmp_path), path, num_classes=3,
                    offset_list=[(1, 0)])
    dl = DataLoader(ds, batch_size=2)
    img, target = next(iter(dl))
    assert img.shape == (2, 32, 48, 3)
    assert target.shape == (2, 32, 48, 4)
    assert len(dl) == 1


def test_dataloader_prefetch(tmp_path):
    path = _make_coco_json(str(tmp_path))
    ds = AllDataset(str(tmp_path), path, num_classes=3,
                    offset_list=[(1, 0)])
    dl = DataLoader(ds, batch_size=1, prefetch=2)
    batches = list(dl)
    assert len(batches) == 2
    img, target = batches[0]
    assert img.shape == (1, 32, 48, 3)
