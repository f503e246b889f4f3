"""Root-cause experiment for the exact-mode AP deficit (VERDICT r3 #1).

The progressive exact mode (rolls-only Boruvka round -> aggregated pair
rounds) lost 2.7-12.2 AP to the serial C++ greedy on every certification
seed.  Hypothesis: the rolls round hooks EVERY weakly-positive singleton
pair simultaneously, committing cross-instance seam merges that the
greedy — popping a global best-first heap — would defer until the
components had grown and their aggregated cross-seam evidence (mostly
negative log-odds) flipped the recomputed priority negative.

This script decodes the committed native-512x1024 fixtures under a
matrix of (rolls hook_threshold, pair-round annealing) configurations
and scores each against the GT annotations, next to the committed C++
greedy masks.  Usage:

    python scripts/analyze_exact_deficit.py [n_fixtures] [config ...]
"""
import contextlib
import io
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp  # noqa: E402

from mergenet_tpu.decoder.device import (  # noqa: E402
    boruvka_rolls_round, _pair_exact_finish, _count_unique_pairs,
    _bucket, relabel_mask, decode_hierarchical)
from mergenet_tpu.data import rle as maskUtils  # noqa: E402
from mergenet_tpu.data.coco import COCO  # noqa: E402
from mergenet_tpu.data.cocoeval import COCOeval  # noqa: E402

FIX = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "certification512")

CONFIGS = {
    # name: (hook_threshold, anneal_start, anneal_halvings)
    "exact0": (0.0, 0.0, 0),      # the shipped round-3 exact mode
    "hookA":  (4.0, 4.0, 10),     # defer sub-4.0 hooks, anneal down
    "hookB":  (2.0, 2.0, 8),
    "annealC": (0.0, 16.0, 12),   # anneal pair rounds only
    "hookD":  (8.0, 8.0, 12),     # near-full greedy-order emulation
}


def mask_to_results(mask, classes, img_id):
    out = []
    for i, cls in enumerate(classes, start=1):
        m = (mask == i).astype(np.uint8)
        if m.sum():
            out.append({"image_id": img_id, "score": 1.0,
                        "category_id": int(cls), "area": int(m.sum()),
                        "segmentation": maskUtils.encode(
                            np.asfortranarray(m))})
    return out


def ap_of(coco, results, img_ids=None):
    if not results:
        return 0.0, 0.0
    E = COCOeval(coco, coco.loadRes(results), "segm")
    if img_ids is not None:
        E.params.imgIds = list(img_ids)
    E.evaluate()
    E.accumulate()
    with contextlib.redirect_stdout(io.StringIO()):
        E.summarize()
    return float(E.stats[0]), float(E.stats[1])


def decode_exact(cp, sp, offsets, hook, astart, ahalv):
    hyper = dict(object_merge_factor=1.0, merge_logprob_bias=0.03,
                 den_mode="sum")
    label, n_comp, n_ext = boruvka_rolls_round(
        cp, sp, cp.shape[-1], offsets, hook_threshold=hook, **hyper)
    n_pairs = int(_count_unique_pairs(label, offsets))
    comp, rc, ii = _pair_exact_finish(
        cp, sp, cp.shape[-1], offsets, initial_labels=label,
        max_components=_bucket(int(n_comp), 4096),
        pair_slots=_bucket(n_pairs + 2, 16384),
        edge_slots=_bucket(int(n_ext) + 1, 16384),
        pair_rounds=64, anneal_start=astart, anneal_halvings=ahalv,
        **hyper)
    return comp, rc, ii, int(n_comp), n_pairs


def main():
    n_fix = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    names = sys.argv[2:] or list(CONFIGS)
    coco = COCO(os.path.join(FIX, "val_ann.json"))
    offsets = tuple(tuple(int(x) for x in o)
                    for o in np.load(os.path.join(FIX, "offsets.npy")))
    ids = sorted(int(f.split("_")[1].split(".")[0])
                 for f in os.listdir(FIX) if f.startswith("probs_"))[:n_fix]

    res = {n: [] for n in names}
    res["cpp"] = []
    res["hier"] = []
    for i in ids:
        d = np.load(os.path.join(FIX, "probs_%d.npz" % i))
        cp = jnp.asarray(d["cp"].astype(np.float32))
        sp = jnp.asarray(d["sp"].astype(np.float32))
        cm = np.load(os.path.join(FIX, "cpp_mask_%d.npz" % i))
        res["cpp"] += mask_to_results(cm["mask"].astype(np.int32),
                                      [int(c) for c in cm["classes"]], i)
        t0 = time.time()
        comp, rc, ii = decode_hierarchical(
            cp, sp, cp.shape[-1], offsets, object_merge_factor=1.0,
            merge_logprob_bias=0.03)
        mask, ic = relabel_mask(comp, rc, ii)
        classes = [int(c) for c in np.asarray(ic) if c >= 0]
        res["hier"] += mask_to_results(np.asarray(mask), classes, i)
        t_hier = time.time() - t0
        line = ["img %d: hier %.1fs" % (i, t_hier)]
        for n in names:
            hook, astart, ahalv = CONFIGS[n]
            t0 = time.time()
            comp, rc, ii, n_comp, n_pairs = decode_exact(
                cp, sp, offsets, hook, astart, ahalv)
            mask, ic = relabel_mask(comp, rc, ii)
            classes = [int(c) for c in np.asarray(ic) if c >= 0]
            res[n] += mask_to_results(np.asarray(mask), classes, i)
            line.append("%s %.1fs(c%dk,p%dk)" % (
                n, time.time() - t0, n_comp // 1000, n_pairs // 1000))
        print("  ".join(line), flush=True)

    print("\n=== AP over %d fixtures (imgIds-restricted) ===" % len(ids))
    for n in ["cpp", "hier"] + names:
        ap, ap50 = ap_of(coco, res[n], img_ids=ids)
        print("%-8s AP %.4f  AP50 %.4f" % (n, ap, ap50), flush=True)
    print("\n=== per-image AP ===")
    for i in ids:
        row = ["img %d:" % i]
        for n in ["cpp", "hier"] + names:
            sub = [r for r in res[n] if r["image_id"] == i]
            ap, _ = ap_of(coco, sub, img_ids=[i])
            row.append("%s %.4f" % (n, ap))
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
