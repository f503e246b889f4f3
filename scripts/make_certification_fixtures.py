#!/usr/bin/env python3
"""Regenerate the decoder-certification evidence (VERDICT r2 #2).

Pipeline, fully reproducible from this one script:
  1. synthetic street dataset at the NATIVE reference decode size
     (512x1024; `segment.py:93`), 60 train / 50 val images
     (egs/cityscape/local/make_synthetic_data.py);
  2. train PSPFPNet-r50 (mode=all, grain input pipeline) for --epochs
     epochs per seed on the attached TPU;
  3. run the trained net on every val image at native 512x1024, decode
     with (a) `decode_hierarchical` defaults (the certified serving
     config), (b) the on-device exact oracle, (c) the C++ greedy parity
     oracle;
  4. COCOeval mask AP for each decoder, per seed;
  5. write per-seed summaries to --out/summary.json and (seed 0 only)
     committed-fixture npz files: f16 probs + C++ masks for --fixtures
     images.

Usage:
  python scripts/make_certification_fixtures.py --out /tmp/cert \
      --seeds 0 1 2 --epochs 40 [--num-classes 9 --height 512 --width 1024]
"""

import argparse
import contextlib
import io
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
EGS = os.path.join(REPO, "egs", "cityscape", "local")


def run_cli(script, *argv):
    cmd = [sys.executable, os.path.join(EGS, script)] + [str(a)
                                                         for a in argv]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    t0 = time.time()
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError("{} failed:\n{}\n{}".format(
            script, r.stdout[-3000:], r.stderr[-3000:]))
    print("  {} done in {:.0f}s".format(script, time.time() - t0))
    return r.stdout


def mask_to_results(mask, classes, img_id):
    from mergenet_tpu.data import rle as maskUtils
    out = []
    for i, cls in enumerate(classes, start=1):
        m = (mask == i).astype(np.uint8)
        if m.sum():
            out.append({"image_id": int(img_id), "score": 1.0,
                        "category_id": int(cls), "area": int(m.sum()),
                        "segmentation": maskUtils.encode(
                            np.asfortranarray(m))})
    return out


def coco_ap(coco, results):
    from mergenet_tpu.data.cocoeval import COCOeval
    if not results:
        return 0.0, 0.0
    E = COCOeval(coco, coco.loadRes(results), "segm")
    E.evaluate()
    E.accumulate()
    with contextlib.redirect_stdout(io.StringIO()):
        E.summarize()
    return float(E.stats[0]), float(E.stats[1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--num-classes", type=int, default=9)
    ap.add_argument("--num-offsets", type=int, default=10)
    ap.add_argument("--train-images", type=int, default=60)
    ap.add_argument("--val-images", type=int, default=50)
    ap.add_argument("--crop-size", type=int, default=384)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--fixtures", type=int, default=8,
                    help="fixture images (from the first seed) to save")
    ap.add_argument("--skip-cpp", action="store_true")
    ap.add_argument("--skip-exact", action="store_true")
    ap.add_argument("--data-seed", type=int, default=100)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    data_dir = os.path.join(args.out, "data")

    # ---- 1. dataset ----
    if not os.path.exists(os.path.join(data_dir, "annotations",
                                       "instancesonly_val.json")):
        run_cli("make_synthetic_data.py", "--out-dir", data_dir,
                "--train-images", args.train_images,
                "--val-images", args.val_images,
                "--height", args.height, "--width", args.width,
                "--num-classes", args.num_classes,
                "--seed", args.data_seed)
    train_ann = os.path.join(data_dir, "annotations",
                             "instancesonly_train.json")
    val_ann = os.path.join(data_dir, "annotations",
                           "instancesonly_val.json")

    import jax
    import jax.numpy as jnp
    from mergenet_tpu.core import generate_offsets
    from mergenet_tpu.models import get_model
    from mergenet_tpu.parallel import make_optimizer, create_train_state
    from mergenet_tpu.utils.checkpoint import load_checkpoint
    from mergenet_tpu.decoder.device import (decode_hierarchical,
                                             relabel_mask,
                                             run_segmentation_device)
    from mergenet_tpu.data.coco import COCO

    offsets = tuple(generate_offsets(80, args.num_offsets))
    C, O = args.num_classes, args.num_offsets
    coco = COCO(val_ann)
    val_ids = sorted(coco.imgs.keys())
    summary = {"config": vars(args), "offsets": [list(o) for o in offsets],
               "seeds": {}}

    for seed in args.seeds:
        exp = os.path.join(args.out, "seed{}".format(seed))
        # ---- 2. train (grain pipeline, per-seed init/shuffle seeds) ----
        if not os.path.isdir(os.path.join(exp, "model_best")):
            run_cli("train.py", exp, "--mode", "all",
                    "--input-pipeline", "grain",
                    "--train-img", os.path.join(data_dir, "train"),
                    "--val-img", os.path.join(data_dir, "val"),
                    "--train-ann", train_ann, "--val-ann", val_ann,
                    "--num-classes", C, "--num-offsets", O,
                    "--arch", "pspfpnet", "--batch-size", args.batch_size,
                    "--crop-size", args.crop_size,
                    "--epochs", args.epochs, "--lr", "0.02",
                    "--val-limits", "6",
                    "--milestones", int(args.epochs * 0.6),
                    int(args.epochs * 0.85),
                    "--seed", seed)

        # ---- 3. inference + decode ----
        model = get_model(C, O, "pspfpnet")
        tx = make_optimizer(lr=0.02)
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   (1, 128, 128, 3))
        state, meta = load_checkpoint(os.path.join(exp, "model_best"),
                                      state)

        @jax.jit
        def probs_fn(params, batch_stats, x):
            logits = model.apply({"params": params,
                                  "batch_stats": batch_stats},
                                 x, train=False)
            return jax.nn.sigmoid(logits)

        import cv2
        res = {"hier": [], "exact": [], "cpp": []}
        times = {"hier": 0.0, "exact": 0.0, "cpp": 0.0}
        stats_agg = {"edges_dropped": 0, "pairs_dropped": 0, "n_frozen": 0}
        fixdir = os.path.join(args.out, "fixtures")
        os.makedirs(fixdir, exist_ok=True)
        for n_i, img_id in enumerate(val_ids):
            fname = coco.loadImgs(img_id)[0]["file_name"]
            img = cv2.imread(os.path.join(data_dir, "val", fname))
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            x = jnp.asarray(img.astype(np.float32)[None] / 256.0)
            probs = np.asarray(probs_fn(state.params, state.batch_stats,
                                        x))[0]
            cp = probs[..., :C].astype(np.float32)
            sp = probs[..., C:].astype(np.float32)

            t0 = time.time()
            comp, rc, ii, st = decode_hierarchical(
                jnp.asarray(cp), jnp.asarray(sp), C, offsets,
                object_merge_factor=1.0, merge_logprob_bias=0.03,
                return_stats=True)
            mask, ic = relabel_mask(comp, rc, ii)
            mask = np.asarray(mask)
            times["hier"] += time.time() - t0
            for k in stats_agg:
                stats_agg[k] += int(st[k])
            classes = [int(c) for c in np.asarray(ic) if c >= 0]
            res["hier"] += mask_to_results(mask, classes, img_id)

            if not args.skip_exact:
                t0 = time.time()
                emask, ecls = run_segmentation_device(
                    np.moveaxis(cp, -1, 0), np.moveaxis(sp, -1, 0), C,
                    offsets, object_merge_factor=1.0,
                    merge_logprob_bias=0.03)
                times["exact"] += time.time() - t0
                res["exact"] += mask_to_results(emask, ecls, img_id)

            cmask = ccls = None
            if not args.skip_cpp:
                from mergenet_tpu.decoder.csegment import run_segmentation
                t0 = time.time()
                cmask, ccls = run_segmentation(
                    np.ascontiguousarray(np.moveaxis(cp, -1, 0)),
                    np.ascontiguousarray(np.moveaxis(sp, -1, 0)), C,
                    list(offsets), same_different_bias=0.0,
                    object_merge_factor=1.0, merge_logprob_bias=0.03)
                times["cpp"] += time.time() - t0
                res["cpp"] += mask_to_results(cmask, ccls, img_id)

            if seed == args.seeds[0] and n_i < args.fixtures:
                np.savez_compressed(
                    os.path.join(fixdir, "probs_{}.npz".format(img_id)),
                    cp=cp.astype(np.float16), sp=sp.astype(np.float16))
                if cmask is not None:
                    np.savez_compressed(
                        os.path.join(fixdir,
                                     "cpp_mask_{}.npz".format(img_id)),
                        mask=cmask.astype(np.int32),
                        classes=np.asarray(ccls, np.int32))
            print("  seed {} img {}/{} decoded".format(
                seed, n_i + 1, len(val_ids)), flush=True)

        entry = {"times_s": {k: round(v, 1) for k, v in times.items()},
                 "overflow": stats_agg}
        for k in ("hier", "exact", "cpp"):
            if res[k]:
                ap_, ap50 = coco_ap(coco, res[k])
                entry[k] = {"AP": round(ap_, 4), "AP50": round(ap50, 4)}
        summary["seeds"][str(seed)] = entry
        print("seed {}: {}".format(seed, json.dumps(entry)))
        with open(os.path.join(args.out, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)

    if args.fixtures:
        np.save(os.path.join(args.out, "fixtures", "offsets.npy"),
                np.asarray(offsets, np.int32))
        import shutil
        shutil.copy(val_ann, os.path.join(args.out, "fixtures",
                                          "val_ann.json"))
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
