"""Per-image exact-vs-greedy AP over a FULL certification val set
(VERDICT r3 #1 root-cause, stage 2).

The committed 8 fixtures show exact >= cpp (+1.7 AP,
scripts/analyze_exact_deficit.py), yet summary.json reports exact 2.7 -
12.2 AP BEHIND over each 50-image seed — so a handful of the other
images must fail catastrophically.  This script recomputes probs from a
trained seed checkpoint (scripts/make_certification_fixtures.py layout),
decodes every val image with hier / exact / C++ greedy, and prints the
per-image AP table ranked by (cpp - exact) so the failing frames are
identifiable; it saves the worst frame's probs for micro-analysis.

Usage:
    python scripts/analyze_exact_deficit_full.py /tmp/cert512b seed0 \
        [--skip-cpp] [--limit N] [--dump-worst /tmp/worst.npz]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(REPO, "scripts"))
from analyze_exact_deficit import ap_of, mask_to_results  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out")
    p.add_argument("seed", help="seed subdir name, e.g. seed0")
    p.add_argument("--skip-cpp", action="store_true")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--dump-worst", default="")
    args = p.parse_args()

    from mergenet_tpu.core import generate_offsets
    from mergenet_tpu.models import get_model
    from mergenet_tpu.parallel import make_optimizer, create_train_state
    from mergenet_tpu.utils.checkpoint import load_checkpoint
    from mergenet_tpu.decoder.device import (decode_hierarchical,
                                             relabel_mask,
                                             run_segmentation_device)
    from mergenet_tpu.data.coco import COCO

    data_dir = os.path.join(args.out, "data")
    val_ann = os.path.join(data_dir, "annotations",
                           "instancesonly_val.json")
    summary = json.load(open(os.path.join(args.out, "summary.json")))
    C = summary["config"]["num_classes"]
    O = summary["config"]["num_offsets"]
    offsets = tuple(tuple(o) for o in summary["offsets"])

    model = get_model(C, O, "pspfpnet")
    tx = make_optimizer(lr=0.02)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               (1, 128, 128, 3))
    state, _ = load_checkpoint(
        os.path.join(args.out, args.seed, "model_best"), state)

    @jax.jit
    def probs_fn(params, batch_stats, x):
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             x, train=False)
        return jax.nn.sigmoid(logits)

    import cv2
    coco = COCO(val_ann)
    val_ids = sorted(coco.imgs.keys())
    if args.limit:
        val_ids = val_ids[:args.limit]
    hyper = dict(object_merge_factor=1.0, merge_logprob_bias=0.03)

    res = {"hier": {}, "exact": {}, "cpp": {}}
    probs_cache = {}
    for n_i, img_id in enumerate(val_ids):
        fname = coco.loadImgs(img_id)[0]["file_name"]
        img = cv2.imread(os.path.join(data_dir, "val", fname))
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        x = jnp.asarray(img.astype(np.float32)[None] / 256.0)
        probs = np.asarray(probs_fn(state.params, state.batch_stats, x))[0]
        cp = probs[..., :C].astype(np.float32)
        sp = probs[..., C:].astype(np.float32)
        probs_cache[img_id] = (cp.astype(np.float16),
                               sp.astype(np.float16))

        comp, rc, ii = decode_hierarchical(
            jnp.asarray(cp), jnp.asarray(sp), C, offsets, **hyper)
        mask, ic = relabel_mask(comp, rc, ii)
        classes = [int(c) for c in np.asarray(ic) if c >= 0]
        res["hier"][img_id] = mask_to_results(np.asarray(mask), classes,
                                              img_id)

        t0 = time.time()
        emask, ecls = run_segmentation_device(
            np.moveaxis(cp, -1, 0), np.moveaxis(sp, -1, 0), C, offsets,
            mode="exact", **hyper)
        te = time.time() - t0
        res["exact"][img_id] = mask_to_results(emask, ecls, img_id)

        if not args.skip_cpp:
            from mergenet_tpu.decoder.csegment import run_segmentation
            cmask, ccls = run_segmentation(
                np.ascontiguousarray(np.moveaxis(cp, -1, 0)),
                np.ascontiguousarray(np.moveaxis(sp, -1, 0)), C,
                list(offsets), same_different_bias=0.0, **hyper)
            res["cpp"][img_id] = mask_to_results(cmask, ccls, img_id)
        print("img %s (%d/%d) exact %.1fs n_inst hier=%d exact=%d cpp=%d"
              % (img_id, n_i + 1, len(val_ids), te,
                 len(res["hier"][img_id]), len(res["exact"][img_id]),
                 len(res["cpp"].get(img_id, []))), flush=True)

    names = ["hier", "exact"] + ([] if args.skip_cpp else ["cpp"])
    print("\n=== AP over %d val images ===" % len(val_ids))
    for n in names:
        allres = [r for v in res[n].values() for r in v]
        ap, ap50 = ap_of(coco, allres, img_ids=val_ids)
        print("%-6s AP %.4f  AP50 %.4f" % (n, ap, ap50), flush=True)

    print("\n=== per-image, ranked by cpp - exact ===")
    rows = []
    for i in val_ids:
        apx = {n: ap_of(coco, res[n][i], img_ids=[i])[0] for n in names}
        rows.append((apx.get("cpp", 0) - apx["exact"], i, apx))
    rows.sort(reverse=True)
    for d, i, apx in rows:
        print("img %-4s deficit %+.4f   %s" % (
            i, d, "  ".join("%s %.4f" % (n, apx[n]) for n in names)),
            flush=True)

    if args.dump_worst and rows:
        _, wid, _ = rows[0]
        cp16, sp16 = probs_cache[wid]
        np.savez_compressed(args.dump_worst, cp=cp16, sp=sp16,
                            img_id=wid)
        print("worst frame %s probs -> %s" % (wid, args.dump_worst))


if __name__ == "__main__":
    main()
