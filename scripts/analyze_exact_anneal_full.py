"""Full-valset AP of the ANNEALED exact mode (VERDICT r3 #1, stage 4).

The worst-frame micro-analysis (scripts/analyze_exact_worst.py) shows
annealed aggregated pair rounds (tau schedule 8.0 halved each round)
recover most of the exact mode's deficit against the C++ greedy; this
script measures it over the full 50-image val set so the fix can be
certified (done = exact_anneal >= cpp - 1 AP overall).

Usage:
    python scripts/analyze_exact_anneal_full.py /tmp/cert512b seed0 \
        [--anneal-start 8.0] [--anneal-halvings 8]
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
    p.add_argument("--anneal-start", type=float, default=8.0,
                   help="tau schedule start (the scale-free maxpri/2 "
                        "cap always applies; see _pair_rounds)")
    p.add_argument("--anneal-halvings", type=int, default=8)
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args()

    from mergenet_tpu.models import get_model
    from mergenet_tpu.parallel import make_optimizer, create_train_state
    from mergenet_tpu.utils.checkpoint import load_checkpoint
    from mergenet_tpu.decoder.device import (
        boruvka_rolls_round, _pair_exact_finish, _count_unique_pairs,
        _bucket, relabel_mask)
    from mergenet_tpu.data.coco import COCO

    data_dir = os.path.join(args.out, "data")
    coco = COCO(os.path.join(data_dir, "annotations",
                             "instancesonly_val.json"))
    summary = json.load(open(os.path.join(args.out, "summary.json")))
    C = summary["config"]["num_classes"]
    offsets = tuple(tuple(o) for o in summary["offsets"])

    model = get_model(C, len(offsets), "pspfpnet")
    from mergenet_tpu.parallel import make_optimizer as _mo
    tx = _mo(lr=0.02)
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
    val_ids = sorted(coco.imgs.keys())
    if args.limit:
        val_ids = val_ids[:args.limit]

    import cv2
    res = {}
    t_decode = 0.0
    for n_i, img_id in enumerate(val_ids):
        fname = coco.loadImgs(img_id)[0]["file_name"]
        img = cv2.cvtColor(cv2.imread(os.path.join(data_dir, "val", fname)),
                           cv2.COLOR_BGR2RGB)
        x = jnp.asarray(img.astype(np.float32)[None] / 256.0)
        probs = np.asarray(probs_fn(state.params, state.batch_stats, x))[0]
        cp = jnp.asarray(probs[..., :C].astype(np.float32))
        sp = jnp.asarray(probs[..., C:].astype(np.float32))

        t0 = time.time()
        label, n_comp, n_ext = boruvka_rolls_round(cp, sp, C, offsets,
                                                   **hyper)
        n_pairs = int(_count_unique_pairs(label, offsets))
        comp, rc, ii = _pair_exact_finish(
            cp, sp, C, offsets, initial_labels=label,
            max_components=_bucket(int(n_comp), 4096),
            pair_slots=_bucket(n_pairs + 2, 16384),
            edge_slots=_bucket(int(n_ext) + 1, 16384),
            pair_rounds=64, anneal_start=args.anneal_start,
            anneal_halvings=args.anneal_halvings, **hyper)
        mask, ic = relabel_mask(comp, rc, ii)
        mask = np.asarray(mask)
        t_decode += time.time() - t0
        classes = [int(c) for c in np.asarray(ic) if c >= 0]
        res[img_id] = mask_to_results(mask, classes, img_id)
        print("img %s (%d/%d)" % (img_id, n_i + 1, len(val_ids)),
              flush=True)

    allres = [r for v in res.values() for r in v]
    ap, ap50 = ap_of(coco, allres, img_ids=val_ids)
    print("\nexact_anneal(start=%s, halvings=%d):  AP %.4f  AP50 %.4f  "
          "(%.2f s/frame)" % (args.anneal_start, args.anneal_halvings,
                              ap, ap50, t_decode / len(val_ids)))
    print("\n=== per-image ===")
    for i in val_ids:
        api, _ = ap_of(coco, res[i], img_ids=[i])
        print("img %-4s exactA %.4f" % (i, api), flush=True)


if __name__ == "__main__":
    main()
