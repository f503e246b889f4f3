#!/usr/bin/env python3
"""Offset-head inference stage (CLI parity with reference
`egs/cityscape/local/offset_infer.py`): offsets come FROM THE CHECKPOINT
(reference offset_infer.py:43 — the offset set is part of the model);
writes `<id>.offset.npy` probability maps."""

import argparse

import jax
import jax.numpy as jnp

from mergenet_tpu.models import get_model
from mergenet_tpu.data import OffsetDataset, DataLoader
from mergenet_tpu.parallel import make_optimizer, create_train_state
from mergenet_tpu.utils.checkpoint import load_checkpoint
from mergenet_tpu.utils.inference_utils import offset_inference

parser = argparse.ArgumentParser(description="cityscape offset inference")
parser.add_argument("--dir", type=str, required=True)
parser.add_argument("--model", type=str, required=True,
                    help="checkpoint directory to load")
parser.add_argument("--img", type=str, default="data/val")
parser.add_argument(
    "--ann", type=str,
    default="data/annotations/instancesonly_filtered_gtFine_val.json")
parser.add_argument("--arch", default="pspfpnet", type=str)
parser.add_argument("--num-offsets", default=10, type=int)
parser.add_argument("--batch-size", default=1, type=int)
parser.add_argument("--scale", default=1, type=int)
parser.add_argument("--limits", default=None, type=int)
parser.add_argument("--score", action="store_true")
parser.add_argument("--bf16", action="store_true",
                    help="bf16 net compute (float32 probs out)")
parser.add_argument("--job", type=int, default=0)
parser.add_argument("--num-jobs", type=int, default=1)


def main():
    args = parser.parse_args()
    model = get_model(0, args.num_offsets, args.arch,
                      dtype=jnp.bfloat16 if args.bf16 else None)
    tx = make_optimizer()
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               (1, 128, 128, 3))
    state, meta = load_checkpoint(args.model, state)
    offset_list = meta.get("offsets")
    assert offset_list, "checkpoint is missing the offset list"
    print("offsets are: {}".format(offset_list))

    dataset = OffsetDataset(args.img, args.ann, offset_list,
                            scale=args.scale, mode="val",
                            limits=args.limits, job=args.job,
                            num_jobs=args.num_jobs)
    dataloader = DataLoader(dataset, batch_size=args.batch_size)
    offset_inference(dataloader, args.dir, state, offset_list,
                     args.batch_size, score=args.score)


if __name__ == "__main__":
    main()
