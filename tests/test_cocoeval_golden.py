"""Golden-value validation of data/cocoeval.py against hand-derived APs.

pycocotools is not installable in this zero-egress image, so these
fixtures pin the evaluator to the COCO AP *definition* instead: each
scenario's AP is derived by hand below from the documented matching rules
(score-ordered greedy matching per IoU threshold, 101-point interpolated
precision, 10 thresholds 0.50:0.05:0.95, crowd regions ignore unmatched
detections).  Any drift in matching, interpolation, thresholds, or crowd
handling breaks an exact expected value (VERDICT round 1, weak #7).
"""

import numpy as np
import pytest

from mergenet_tpu.data import rle as maskUtils
from mergenet_tpu.data.coco import COCO
from mergenet_tpu.data.cocoeval import COCOeval


def _rle(mask):
    r = maskUtils.encode(np.asfortranarray(mask.astype(np.uint8)))
    return {"size": r["size"], "counts": r["counts"].decode("ascii")}


def _square(r0, c0, h, w, H=32, W=32):
    m = np.zeros((H, W), np.uint8)
    m[r0:r0 + h, c0:c0 + w] = 1
    return m


def _eval(gts, dts):
    imgs = sorted({g["image_id"] for g in gts})
    gt = {
        "images": [{"id": i, "height": 32, "width": 32} for i in imgs],
        "annotations": [dict(g, id=k + 1, area=float(
            maskUtils.area(maskUtils.encode(np.asfortranarray(
                maskUtils.decode(g["segmentation"]))))))
            for k, g in enumerate(gts)],
        "categories": [{"id": 1, "name": "thing"}],
    }
    coco = COCO()
    coco.dataset = gt
    coco.createIndex()
    E = COCOeval(coco, coco.loadRes(dts), "segm")
    E.evaluate()
    E.accumulate()
    import io, contextlib
    with contextlib.redirect_stdout(io.StringIO()):
        E.summarize()
    return E.stats


def test_partial_match_ap():
    """G1 matched exactly, G2's detection only reaches IoU 1/3 (< 0.5).

    At every threshold: ranked dets = [TP(1.0), FP]; P=1 at R=0.5 then
    P=0.5 at R=0.5.  Interpolated precision: 1.0 for the 51 recall points
    <= 0.5, else 0.  AP = 51/101 at all 10 thresholds.
    """
    g1, g2 = _square(0, 0, 10, 10), _square(20, 20, 10, 10)
    d2 = _square(20, 15, 10, 10)  # inter 50, union 150 -> IoU 1/3
    gts = [{"image_id": 1, "category_id": 1, "iscrowd": 0,
            "segmentation": _rle(g1)},
           {"image_id": 1, "category_id": 1, "iscrowd": 0,
            "segmentation": _rle(g2)}]
    dts = [{"image_id": 1, "category_id": 1, "score": 0.9,
            "segmentation": _rle(g1)},
           {"image_id": 1, "category_id": 1, "score": 0.8,
            "segmentation": _rle(d2)}]
    stats = _eval(gts, dts)
    assert stats[0] == pytest.approx(51 / 101, abs=1e-6)   # AP
    assert stats[1] == pytest.approx(51 / 101, abs=1e-6)   # AP50


def test_threshold_sweep_and_score_order():
    """One GT, two overlapping detections: D2 (score .95, IoU 0.55) and
    D1 (score .9, IoU 0.6).

    t in {.50,.55}: D2 matches first (higher score) -> AP_t = 1.
    t = .60: D2 fails, D1 matches at rank 2 behind an FP -> the precision
    envelope is 0.5 at every recall -> AP_t = 0.5.
    t >= .65: no match -> 0.  AP = (1 + 1 + 0.5)/10 = 0.25; AP50 = 1.
    """
    g1 = _square(0, 0, 20, 10)   # 200 px GT
    # D1: rows 5..24 -> inter 150, union 250 -> IoU exactly 0.60
    d1 = _square(5, 0, 20, 10)
    # D2: rows 5..25 (21 rows) -> inter 150, union 200+210-150=260 ->
    # IoU 0.577, i.e. in [0.55, 0.60) as the derivation requires
    d2 = _square(5, 0, 21, 10)
    gts = [{"image_id": 1, "category_id": 1, "iscrowd": 0,
            "segmentation": _rle(g1)}]
    dts = [{"image_id": 1, "category_id": 1, "score": 0.95,
            "segmentation": _rle(d2)},
           {"image_id": 1, "category_id": 1, "score": 0.90,
            "segmentation": _rle(d1)}]
    stats = _eval(gts, dts)
    assert stats[0] == pytest.approx(0.25, abs=1e-6)
    assert stats[1] == pytest.approx(1.0, abs=1e-6)


def test_crowd_regions_absorb_unmatched_detections():
    """A detection inside an iscrowd GT is ignored, not counted as FP
    (crowd IoU = intersection / det area).  Only the true match counts:
    AP = AP50 = 1."""
    g1 = _square(0, 0, 10, 10)
    crowd = _square(16, 0, 16, 32)
    d_in_crowd = _square(20, 4, 6, 6)
    gts = [{"image_id": 1, "category_id": 1, "iscrowd": 0,
            "segmentation": _rle(g1)},
           {"image_id": 1, "category_id": 1, "iscrowd": 1,
            "segmentation": _rle(crowd)}]
    dts = [{"image_id": 1, "category_id": 1, "score": 0.9,
            "segmentation": _rle(g1)},
           {"image_id": 1, "category_id": 1, "score": 0.8,
            "segmentation": _rle(d_in_crowd)}]
    stats = _eval(gts, dts)
    assert stats[0] == pytest.approx(1.0, abs=1e-6)
    assert stats[1] == pytest.approx(1.0, abs=1e-6)
