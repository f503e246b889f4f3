"""Micro-analysis of the exact-mode AP deficit on its worst frames
(VERDICT r3 #1, stage 3).

The 50-image sweep (scripts/analyze_exact_deficit_full.py) shows the
deficit concentrated in ~10 frames; the suspected mechanism is the
rolls-only FIRST round: on singleton components every weakly-positive
(pixel, offset) edge hooks immediately, committing cross-instance seam
merges the serial greedy would defer, re-evaluate against aggregated
evidence, and reject.  This script decodes the worst frames with
candidate counter-measures and prints per-image AP:

  exact0   — shipped exact mode (rolls round at threshold 0 + measured
             capacity pair rounds)
  exactT   — rolls round with hook_threshold=T: only hooks with
             priority >= T apply in round 1; everything else defers to
             the aggregated pair rounds
  exactTA  — exactT + annealed pair rounds (tau halving schedule)
  hierX    — decode_hierarchical with 4x budgets (the serving algorithm
             as an overflow fallback)

Usage:
    python scripts/analyze_exact_worst.py /tmp/cert512b seed0 \
        --ids 16 38 29 5 34 30 --thresholds 1.0 2.0
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
    p.add_argument("seed")
    p.add_argument("--ids", type=int, nargs="+",
                   default=[16, 38, 29, 5, 34, 30, 3, 35])
    p.add_argument("--thresholds", type=float, nargs="+", default=[2.0])
    p.add_argument("--skip-cpp", action="store_true")
    args = p.parse_args()

    from mergenet_tpu.models import get_model
    from mergenet_tpu.parallel import make_optimizer, create_train_state
    from mergenet_tpu.utils.checkpoint import load_checkpoint
    from mergenet_tpu.decoder.device import (
        boruvka_rolls_round, _pair_exact_finish, _count_unique_pairs,
        _bucket, decode_hierarchical, relabel_mask)
    from mergenet_tpu.data.coco import COCO

    data_dir = os.path.join(args.out, "data")
    coco = COCO(os.path.join(data_dir, "annotations",
                             "instancesonly_val.json"))
    summary = json.load(open(os.path.join(args.out, "summary.json")))
    C = summary["config"]["num_classes"]
    offsets = tuple(tuple(o) for o in summary["offsets"])

    model = get_model(C, len(offsets), "pspfpnet")
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

    hyper = dict(object_merge_factor=1.0, merge_logprob_bias=0.03)

    def exact_variant(cp, sp, thr, anneal):
        label, n_comp, n_ext = boruvka_rolls_round(
            jnp.asarray(cp), jnp.asarray(sp), C, offsets,
            hook_threshold=thr, **hyper)
        n_pairs = int(_count_unique_pairs(label, offsets))
        kw = {}
        if anneal:
            kw = dict(anneal_start=8.0, anneal_halvings=8)
        comp, rc, ii = _pair_exact_finish(
            jnp.asarray(cp), jnp.asarray(sp), C, offsets,
            initial_labels=label,
            max_components=_bucket(int(n_comp), 4096),
            pair_slots=_bucket(n_pairs + 2, 16384),
            edge_slots=_bucket(int(n_ext) + 1, 16384),
            pair_rounds=64, **hyper, **kw)
        mask, ic = relabel_mask(comp, rc, ii)
        return np.asarray(mask), [int(c) for c in np.asarray(ic) if c >= 0]

    names = ["exact0"]
    for t in args.thresholds:
        names += ["exact%g" % t, "exact%gA" % t]
    names += ["hierX"]
    if not args.skip_cpp:
        names += ["cpp"]
    res = {n: {} for n in names}
    res["hier"] = {}

    import cv2
    for img_id in args.ids:
        fname = coco.loadImgs(img_id)[0]["file_name"]
        img = cv2.cvtColor(cv2.imread(os.path.join(data_dir, "val", fname)),
                           cv2.COLOR_BGR2RGB)
        x = jnp.asarray(img.astype(np.float32)[None] / 256.0)
        probs = np.asarray(probs_fn(state.params, state.batch_stats, x))[0]
        cp = probs[..., :C].astype(np.float32)
        sp = probs[..., C:].astype(np.float32)

        mk, ic = exact_variant(cp, sp, 0.0, False)
        res["exact0"][img_id] = mask_to_results(mk, ic, img_id)
        for t in args.thresholds:
            mk, ic = exact_variant(cp, sp, float(t), False)
            res["exact%g" % t][img_id] = mask_to_results(mk, ic, img_id)
            mk, ic = exact_variant(cp, sp, float(t), True)
            res["exact%gA" % t][img_id] = mask_to_results(mk, ic, img_id)

        mask, icls = decode_hierarchical(
            jnp.asarray(cp), jnp.asarray(sp), C, offsets,
            pair_components=16384, pair_slots=65536, dedup_slots=512,
            relabel=True, **hyper)
        mk = np.asarray(mask)
        ic = [int(c) for c in np.asarray(icls) if c >= 0]
        res["hierX"][img_id] = mask_to_results(mk, ic, img_id)

        comp, rc, ii = decode_hierarchical(
            jnp.asarray(cp), jnp.asarray(sp), C, offsets, **hyper)
        mask, icls = relabel_mask(comp, rc, ii)
        mk = np.asarray(mask)
        ic = [int(c) for c in np.asarray(icls) if c >= 0]
        res["hier"][img_id] = mask_to_results(mk, ic, img_id)

        if not args.skip_cpp:
            from mergenet_tpu.decoder.csegment import run_segmentation
            cmask, ccls = run_segmentation(
                np.ascontiguousarray(np.moveaxis(cp, -1, 0)),
                np.ascontiguousarray(np.moveaxis(sp, -1, 0)), C,
                list(offsets), same_different_bias=0.0, **hyper)
            res["cpp"][img_id] = mask_to_results(cmask, ccls, img_id)
        print("img %d decoded" % img_id, flush=True)

    all_names = ["hier", "hierX"] + names
    print("\n=== per-image AP ===")
    for i in args.ids:
        row = ["img %-4d" % i]
        for n in all_names:
            if n in res and i in res[n]:
                ap, _ = ap_of(coco, res[n][i], img_ids=[i])
                row.append("%s %.4f" % (n, ap))
        print("  ".join(row), flush=True)
    print("\n=== pooled AP over these frames ===")
    ids = list(args.ids)
    for n in all_names:
        if n in res and res[n]:
            allr = [r for v in res[n].values() for r in v]
            ap, ap50 = ap_of(coco, allr, img_ids=ids)
            print("%-10s AP %.4f  AP50 %.4f" % (n, ap, ap50), flush=True)


if __name__ == "__main__":
    main()
