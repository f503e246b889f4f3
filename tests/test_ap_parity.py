"""AP parity: the on-device parallel decoder must match the host C++ greedy
at the instance-AP level on identical (noisy) inputs — the BASELINE.json
acceptance criterion for the decode reformulation."""

import numpy as np
import pytest

from mergenet_tpu.core import generate_offsets
from mergenet_tpu.data import rle as maskUtils
from mergenet_tpu.data.coco import COCO
from mergenet_tpu.data.cocoeval import COCOeval
from mergenet_tpu.decoder import csegment
from mergenet_tpu.decoder.device import run_segmentation_device

from helpers import oracle_probs

NUM_CLASSES = 5
OFFSETS = tuple(generate_offsets(12, 6))


def _scene(seed, H=96, W=128, n_obj=6):
    rng = np.random.RandomState(seed)
    inst = np.zeros((H, W), np.int32)
    classes = {0: 0}
    for k in range(1, n_obj + 1):
        r, c = rng.randint(0, H - 24), rng.randint(0, W - 32)
        h, w = rng.randint(14, 24), rng.randint(16, 32)
        inst[r:r + h, c:c + w] = k
        classes[k] = rng.randint(1, NUM_CLASSES)
    cp, sp = oracle_probs(inst, classes, NUM_CLASSES, OFFSETS, conf=0.85)
    cp = np.clip(cp + rng.uniform(-0.12, 0.12, cp.shape),
                 1e-4, 1 - 1e-4).astype(np.float32)
    sp = np.clip(sp + rng.uniform(-0.12, 0.12, sp.shape),
                 1e-4, 1 - 1e-4).astype(np.float32)
    return inst, classes, cp, sp


def _gt_coco(scenes):
    imgs, anns, ann_id = [], [], 1
    for img_id, (inst, classes, _, _) in enumerate(scenes):
        H, W = inst.shape
        imgs.append({"id": img_id, "file_name": "x", "height": H,
                     "width": W})
        for k in sorted(set(inst.ravel()) - {0}):
            m = (inst == k).astype(np.uint8)
            r = maskUtils.encode(m)
            anns.append({"id": ann_id, "image_id": img_id,
                         "category_id": int(classes[k]),
                         "segmentation": {"size": r["size"],
                                          "counts":
                                          r["counts"].decode("ascii")},
                         "area": int(m.sum()), "iscrowd": 0})
            ann_id += 1
    coco = COCO()
    coco.dataset = {
        "images": imgs, "annotations": anns,
        "categories": [{"id": c, "name": str(c)}
                       for c in range(1, NUM_CLASSES)]}
    coco.createIndex()
    return coco


def _results(decode_fn, scenes):
    out = []
    for img_id, (_, _, cp, sp) in enumerate(scenes):
        mask, object_class = decode_fn(cp, sp)
        for i in range(1, int(mask.max()) + 1):
            m = (mask == i).astype(np.uint8)
            if m.sum() == 0:
                continue
            out.append({"image_id": img_id,
                        "category_id": int(object_class[i - 1]),
                        "segmentation": maskUtils.encode(
                            np.asfortranarray(m)),
                        "score": 1.0})
    return out


def _ap(coco, results):
    if not results:
        return 0.0
    dt = coco.loadRes(results)
    E = COCOeval(coco, dt, "segm")
    E.evaluate()
    E.accumulate()
    E.summarize()
    return float(E.stats[0])


@pytest.mark.parametrize("factor", [1.0 / len(OFFSETS)])
def test_device_ap_matches_cpp(factor):
    scenes = [_scene(s) for s in range(3)]
    coco = _gt_coco(scenes)

    def cpp(cp, sp):
        return csegment.run_segmentation(
            cp, sp, NUM_CLASSES, OFFSETS, object_merge_factor=factor,
            merge_logprob_bias=0.01)

    def dev(cp, sp):
        return run_segmentation_device(
            cp, sp, NUM_CLASSES, OFFSETS, object_merge_factor=factor,
            merge_logprob_bias=0.01)

    ap_cpp = _ap(coco, _results(cpp, scenes))
    ap_dev = _ap(coco, _results(dev, scenes))
    print("AP cpp={:.4f} device={:.4f}".format(ap_cpp, ap_dev))
    assert ap_cpp > 0.5, "host greedy should solve these scenes"
    assert ap_dev >= ap_cpp - 0.05, (ap_dev, ap_cpp)
