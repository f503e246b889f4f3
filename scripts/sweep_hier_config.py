#!/usr/bin/env python3
"""Sweep decode_hierarchical configs on the certification fixtures.

Decodes every fixture image under each config, scores mask AP against
the GT annotations (restricted to the fixture image ids), and prints a
table next to the committed C++ greedy masks' AP on the same subset.
Used to pick/justify the certified serving defaults at the native
512x1024 decode size.

  python scripts/sweep_hier_config.py --fix /tmp/cert512/fixtures \
      [--configs default absorb2 ...]
"""

import argparse
import contextlib
import io
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = {
    "default": {},
    "absorb2": {"absorb_thetas": (1.0, 1.0)},
    "absorb_lo": {"absorb_thetas": (1.0, 0.5)},
    "rounds128": {"pair_rounds": 128},
    "ccl2": {"ccl_sweeps": 2},
    "margin1": {"ccl_margin": 1.0},
    "margin3": {"ccl_margin": 3.0},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fix", default="/tmp/cert512/fixtures")
    ap.add_argument("--configs", nargs="*", default=list(CONFIGS))
    args = ap.parse_args()

    import jax.numpy as jnp
    from mergenet_tpu.decoder.device import decode_hierarchical, \
        relabel_mask
    from mergenet_tpu.data import rle as maskUtils
    from mergenet_tpu.data.coco import COCO
    from mergenet_tpu.data.cocoeval import COCOeval

    fix = args.fix
    ids = sorted(int(f.split("_")[1].split(".")[0])
                 for f in os.listdir(fix) if f.startswith("probs_"))
    offsets = tuple(tuple(int(x) for x in o)
                    for o in np.load(os.path.join(fix, "offsets.npy")))
    coco = COCO(os.path.join(fix, "val_ann.json"))

    def to_results(mask, classes, img_id):
        out = []
        for i, cls in enumerate(classes, start=1):
            m = (mask == i).astype(np.uint8)
            if m.sum():
                out.append({"image_id": img_id, "score": 1.0,
                            "category_id": int(cls),
                            "area": int(m.sum()),
                            "segmentation": maskUtils.encode(
                                np.asfortranarray(m))})
        return out

    def score(results):
        if not results:
            return 0.0, 0.0
        E = COCOeval(coco, coco.loadRes(results), "segm")
        E.params.imgIds = ids
        E.evaluate()
        E.accumulate()
        with contextlib.redirect_stdout(io.StringIO()):
            E.summarize()
        return float(E.stats[0]), float(E.stats[1])

    res_cpp = []
    for i in ids:
        cm = np.load(os.path.join(fix, "cpp_mask_%d.npz" % i))
        res_cpp += to_results(cm["mask"].astype(np.int32),
                              [int(c) for c in cm["classes"]], i)
    ap_c, ap50_c = score(res_cpp)
    print("cpp greedy     AP %.4f AP50 %.4f  (n=%d)" % (ap_c, ap50_c,
                                                        len(ids)))

    probs = {i: np.load(os.path.join(fix, "probs_%d.npz" % i))
             for i in ids}
    for name in args.configs:
        kw = CONFIGS[name]
        res, t, drops = [], 0.0, 0
        for i in ids:
            cp = jnp.asarray(probs[i]["cp"].astype(np.float32))
            sp = jnp.asarray(probs[i]["sp"].astype(np.float32))
            t0 = time.time()
            comp, rc, ii, st = decode_hierarchical(
                cp, sp, cp.shape[-1], offsets, object_merge_factor=1.0,
                merge_logprob_bias=0.03, return_stats=True, **kw)
            mask, ic = relabel_mask(comp, rc, ii)
            mask = np.asarray(mask)
            t += time.time() - t0
            drops += int(st["edges_dropped"]) + int(st["pairs_dropped"]) \
                + int(st["n_frozen"])
            classes = [int(c) for c in np.asarray(ic) if c >= 0]
            res += to_results(mask, classes, i)
        ap_h, ap50_h = score(res)
        print("%-14s AP %.4f AP50 %.4f  dAP %+.4f  %.1fs  drops %d" % (
            name, ap_h, ap50_h, ap_h - ap_c, t, drops), flush=True)


if __name__ == "__main__":
    main()
