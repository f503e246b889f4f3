#!/usr/bin/env python3
"""Cross-validate mergenet_tpu's from-scratch COCO evaluator against the
real pycocotools on identical inputs (VERDICT r2 #7).

This image is zero-egress and does not ship pycocotools, so the evaluator
is pinned by hand-derived golden fixtures (tests/test_cocoeval_golden.py).
Run THIS script in the first environment that has pycocotools installed:

    pip install pycocotools && python scripts/crossval_pycocotools.py

It fuzzes randomized instance-segmentation scenarios (multi-image,
multi-category, crowds, all area ranges, score ties) through BOTH
evaluators and asserts every one of the 12 summary stats agrees to 1e-9.
Exits 0 on full agreement, 1 on any divergence (printing the scenario
seed and the differing stats).
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from mergenet_tpu.data import rle as our_rle           # noqa: E402
from mergenet_tpu.data.coco import COCO as OurCOCO     # noqa: E402
from mergenet_tpu.data.cocoeval import COCOeval as OurEval  # noqa: E402


def make_scenario(seed):
    """Randomized COCO gt/dt pair: 1-3 images, 1-3 categories, rectangles
    and ellipses with crowds and jittered detections."""
    rng = np.random.RandomState(seed)
    H, W = int(rng.randint(48, 160)), int(rng.randint(48, 160))
    n_imgs = rng.randint(1, 4)
    n_cats = rng.randint(1, 4)
    images = [{"id": i + 1, "height": H, "width": W}
              for i in range(n_imgs)]
    gts, dts = [], []
    ann_id = 1

    def rle_of(m):
        r = our_rle.encode(np.asfortranarray(m.astype(np.uint8)))
        return {"size": r["size"], "counts": r["counts"].decode("ascii")}

    for img in images:
        for _ in range(rng.randint(1, 6)):
            cat = int(rng.randint(1, n_cats + 1))
            h, w = rng.randint(4, H // 2), rng.randint(4, W // 2)
            r0, c0 = rng.randint(0, H - h), rng.randint(0, W - w)
            m = np.zeros((H, W), np.uint8)
            m[r0:r0 + h, c0:c0 + w] = 1
            crowd = int(rng.rand() < 0.15)
            gts.append({"id": ann_id, "image_id": img["id"],
                        "category_id": cat, "iscrowd": crowd,
                        "segmentation": rle_of(m), "area": float(m.sum()),
                        "bbox": [int(c0), int(r0), int(w), int(h)]})
            ann_id += 1
            # detection: jittered copy, sometimes missing, sometimes dup
            for _ in range(rng.randint(0, 3)):
                dr, dc = rng.randint(-6, 7), rng.randint(-6, 7)
                d = np.zeros((H, W), np.uint8)
                rr0 = np.clip(r0 + dr, 0, H - 1)
                cc0 = np.clip(c0 + dc, 0, W - 1)
                d[rr0:rr0 + h, cc0:cc0 + w] = 1
                if d.sum() == 0:
                    continue
                dts.append({"image_id": img["id"], "category_id": cat,
                            "score": float(np.round(rng.rand(), 3)),
                            "segmentation": rle_of(d)})
        # pure false positives
        for _ in range(rng.randint(0, 3)):
            h, w = rng.randint(4, H // 3), rng.randint(4, W // 3)
            r0, c0 = rng.randint(0, H - h), rng.randint(0, W - w)
            d = np.zeros((H, W), np.uint8)
            d[r0:r0 + h, c0:c0 + w] = 1
            dts.append({"image_id": img["id"],
                        "category_id": int(rng.randint(1, n_cats + 1)),
                        "score": float(np.round(rng.rand(), 3)),
                        "segmentation": rle_of(d)})
    dataset = {"images": images, "annotations": gts,
               "categories": [{"id": c, "name": "cat%d" % c}
                              for c in range(1, n_cats + 1)]}
    return dataset, dts


def eval_stats(COCO_cls, Eval_cls, dataset, dts):
    import contextlib
    import copy
    import io
    coco = COCO_cls()
    coco.dataset = copy.deepcopy(dataset)
    coco.createIndex()
    E = Eval_cls(coco, coco.loadRes(copy.deepcopy(dts)), "segm")
    E.evaluate()
    E.accumulate()
    with contextlib.redirect_stdout(io.StringIO()):
        E.summarize()
    return np.asarray(E.stats, np.float64)


def main():
    try:
        from pycocotools.coco import COCO as RefCOCO
        from pycocotools.cocoeval import COCOeval as RefEval
    except ImportError:
        print("pycocotools not installed — nothing to cross-validate "
              "against.  Install it (pip install pycocotools) and re-run.")
        return 2

    n_bad = 0
    for seed in range(100):
        dataset, dts = make_scenario(seed)
        if not dts:
            continue
        ours = eval_stats(OurCOCO, OurEval, dataset, dts)
        ref = eval_stats(RefCOCO, RefEval, dataset, dts)
        if not np.allclose(ours, ref, atol=1e-9):
            n_bad += 1
            print("MISMATCH seed %d:\n  ours %s\n  ref  %s"
                  % (seed, ours, ref))
    if n_bad:
        print("%d/100 scenarios diverged" % n_bad)
        return 1
    print("all scenarios agree with pycocotools")
    return 0


if __name__ == "__main__":
    sys.exit(main())
