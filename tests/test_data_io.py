"""Legacy npy dataset IO + combined-image validators."""

import os

import numpy as np
import pytest

from mergenet_tpu.core import CoreConfig
from mergenet_tpu.core.types import (validate_config,
                                     validate_image_with_mask,
                                     validate_combined_image)
from mergenet_tpu.data.data_io import DataSaver, WaldoDataset, WaldoTestset


def _cfg():
    c = CoreConfig()
    c.num_classes = 3
    c.num_colors = 3
    c.offsets = [(1, 0), (0, 1)]
    return c


def _sample(c, H=16, W=20):
    img = np.random.RandomState(0).randint(
        0, 255, (H, W, 3)).astype(np.uint8)
    mask = np.zeros((H, W), np.int64)
    mask[2:8, 3:9] = 1
    return {"img": img, "mask": mask, "object_class": [0, 1]}


def test_validators():
    c = _cfg()
    validate_config(c)
    x = _sample(c)
    validate_image_with_mask(x, c)
    with pytest.raises(ValueError):
        validate_image_with_mask({"img": x["img"]}, c)
    with pytest.raises(ValueError):
        bad = dict(x)
        bad["object_class"] = [0, 99]
        validate_image_with_mask(bad, c)
    combined = np.zeros((8, 8, 3 + 3 + 2), np.float32)
    validate_combined_image(combined, c)
    with pytest.raises(ValueError):
        validate_combined_image(np.zeros((8, 8, 4)), c)


def test_datasaver_waldo_roundtrip(tmp_path):
    c = _cfg()
    saver = DataSaver(str(tmp_path), c)
    x = _sample(c)
    saver.write_image("im0", x)
    saver.write_image("im1", x)
    with pytest.raises(ValueError):
        saver.write_image("im0", x)  # duplicate
    with pytest.raises(ValueError):
        saver.write_image("bad name", x)
    saver.write_index()
    assert os.path.exists(os.path.join(str(tmp_path), "image_ids.txt"))

    ds = WaldoDataset(str(tmp_path), c, size=8, mask=True)
    assert len(ds) == 2
    img, class_label, bound, mask = ds[0]
    assert img.shape == (8, 8, 3)
    assert class_label.shape == (8, 8, 3)
    assert bound.shape == (8, 8, 2)
    assert mask.shape == (8, 8)


def test_waldo_testset(tmp_path):
    c = _cfg()
    saver = DataSaver(str(tmp_path), c, train=False)
    x = _sample(c)
    saver.write_image("t0", {"img": x["img"]})
    saver.write_index()
    ts = WaldoTestset(str(tmp_path), scale_size=12)
    img, size, id = ts[0]
    assert img.shape == (12, 12, 3)
    assert size == (16, 20)
    assert id == "t0"
