#!/usr/bin/env python3
"""One-shot end-to-end inference: net forward + on-device merge decode in
a single jitted program per batch — the production fast path (no npy
handoff between class_infer/offset_infer/segment stages).

Requires an 'all'-mode checkpoint (class + offset heads in one model).
Writes the same per-image COCO-result pkls the staged pipeline produces,
so evaluate.py / submit.py work unchanged downstream."""

import argparse
import os
import pickle

import numpy as np

import jax

from mergenet_tpu.models import get_model
from mergenet_tpu.data import AllDataset, DataLoader
from mergenet_tpu.parallel import make_optimizer, create_train_state
from mergenet_tpu.utils.checkpoint import load_checkpoint
from mergenet_tpu.utils.e2e import build_e2e_infer, masks_to_results

parser = argparse.ArgumentParser(description="end-to-end TPU inference")
parser.add_argument("--dir", type=str, required=True)
parser.add_argument("--model", type=str, required=True,
                    help="'all'-mode checkpoint directory")
parser.add_argument("--img", type=str, default="data/val")
parser.add_argument(
    "--ann", type=str,
    default="data/annotations/instancesonly_filtered_gtFine_val.json")
parser.add_argument("--arch", default="pspfpnet", type=str)
parser.add_argument("--num-classes", default=9, type=int)
parser.add_argument("--num-offsets", default=10, type=int)
parser.add_argument("--batch-size", default=1, type=int)
parser.add_argument("--segment", type=str, default="segment")
parser.add_argument("--decode-size", default=None, type=int, nargs=2,
                    help="(h, w) decode resolution; default half input")
parser.add_argument("--object-merge-factor", type=float, default=1.0)
parser.add_argument("--same-different-bias", type=float, default=0.0)
parser.add_argument("--merge-logprob-bias", type=float, default=0.03)
parser.add_argument("--bf16", action="store_true",
                    help="bf16 net compute")
parser.add_argument("--limits", default=None, type=int)
parser.add_argument("--job", type=int, default=0)
parser.add_argument("--num-jobs", type=int, default=1)
parser.add_argument("--data-parallel", action="store_true",
                    help="shard batches over all attached devices "
                         "(mergenet_tpu.serving; batch size must divide "
                         "by the device count)")


def main():
    import jax.numpy as jnp
    args = parser.parse_args()
    model = get_model(args.num_classes, args.num_offsets, args.arch,
                      dtype=jnp.bfloat16 if args.bf16 else None)
    tx = make_optimizer()
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               (1, 128, 128, 3))
    state, meta = load_checkpoint(args.model, state)
    offset_list = meta.get("offsets")
    assert offset_list, "checkpoint is missing the offset list"
    print("offsets are: {}".format(offset_list))

    dataset = AllDataset(args.img, args.ann, args.num_classes, offset_list,
                         mode="test", limits=args.limits, job=args.job,
                         num_jobs=args.num_jobs)
    loader = DataLoader(dataset, batch_size=args.batch_size)

    if args.data_parallel and len(jax.devices()) > 1:
        from mergenet_tpu.parallel import make_mesh
        from mergenet_tpu.serving import build_serving_pipeline
        mesh = make_mesh(data=len(jax.devices()))
        infer = build_serving_pipeline(
            model, args.num_classes, offset_list, mesh,
            decode_size=tuple(args.decode_size) if args.decode_size
            else None,
            same_different_bias=args.same_different_bias,
            object_merge_factor=args.object_merge_factor,
            merge_logprob_bias=args.merge_logprob_bias)
    else:
        infer = build_e2e_infer(
            model, args.num_classes, offset_list,
            decode_size=tuple(args.decode_size) if args.decode_size
            else None,
            same_different_bias=args.same_different_bias,
            object_merge_factor=args.object_merge_factor,
            merge_logprob_bias=args.merge_logprob_bias)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    pkl_dir = os.path.join(args.dir, args.segment, "pkl")
    os.makedirs(pkl_dir, exist_ok=True)
    exist = set(next(os.walk(pkl_dir))[2])
    n_dev = len(jax.devices()) if args.data_parallel else 1
    for image_ids, imgs, sizes in loader:
        if all(str(int(i)) + ".pkl" in exist for i in image_ids):
            continue
        n_real = imgs.shape[0]
        if n_real % n_dev:
            # pad the final partial batch to the device multiple (shard_map
            # requires divisibility); padded outputs are dropped below
            pad = n_dev - n_real % n_dev
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)], 0)
        masks, inst_classes = infer(variables, imgs)
        masks = masks[:n_real]
        inst_classes = inst_classes[:n_real]
        results = masks_to_results(masks, inst_classes, image_ids,
                                   dataset.catIds)
        by_img = {}
        for r in results:
            by_img.setdefault(r["image_id"], []).append(r)
        for i in image_ids:
            with open(os.path.join(pkl_dir,
                                   "{}.pkl".format(int(i))), "wb") as fh:
                pickle.dump(by_img.get(int(i), []), fh)
    print("Done; results in {}".format(pkl_dir))


if __name__ == "__main__":
    main()
