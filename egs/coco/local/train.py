#!/usr/bin/env python3
"""COCO-2017 instance-segmentation training (TPU / JAX).

Parity with reference `egs/coco/local/train.py` (which was stale — it
imported a removed `COCODataset` and called `train()` with an outdated
signature; both fixed here: `COCODataset` is aliased to AllDataset and the
loop uses the current API).  Defaults follow the coco recipe: crop 384,
scale 2."""

import argparse
import random

import jax
import jax.numpy as jnp

from mergenet_tpu.models import get_model, param_count
from mergenet_tpu.data import COCODataset, DataLoader
from mergenet_tpu.ops.losses import get_loss_fn
from mergenet_tpu.parallel import (make_mesh, make_optimizer,
                                   create_train_state, build_train_step,
                                   build_eval_step)
from mergenet_tpu.utils import train, validate, generate_offsets
from mergenet_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from mergenet_tpu.utils import logging as tb

parser = argparse.ArgumentParser(description="TPU coco setup")
parser.add_argument("dir", type=str)
parser.add_argument("--epochs", default=10, type=int)
parser.add_argument("--start-epoch", default=0, type=int)
parser.add_argument("--resume", default="", type=str)
parser.add_argument("--print-freq", "-p", default=10, type=int)
parser.add_argument("--log-freq", default=1000, type=int)
parser.add_argument("-b", "--batch-size", default=16, type=int)
parser.add_argument("--crop-size", default=384, type=int)
parser.add_argument("--scale", default=2, type=int)
parser.add_argument("--loss", default="bce", type=str,
                    choices=["bce", "mbce", "dice", "ce"])
parser.add_argument("--alpha", default=1, type=float)
parser.add_argument("--lr", default=0.01, type=float)
parser.add_argument("--momentum", default=0.9, type=float)
parser.add_argument("--milestones", default=None, nargs="+", type=int)
parser.add_argument("--arch", default="pspfpnet", type=str)
parser.add_argument("--num-classes", default=81, type=int)
parser.add_argument("--num-offsets", default=10, type=int)
parser.add_argument("--weight-decay", default=1e-4, type=float)
parser.add_argument("--train-img", default="data/train2017", type=str)
parser.add_argument("--val-img", default="data/val2017", type=str)
parser.add_argument("--train-ann", type=str,
                    default="data/annotations/instances_train2017.json")
parser.add_argument("--val-ann", type=str,
                    default="data/annotations/instances_val2017.json")
parser.add_argument("--limits", default=None, type=int)
parser.add_argument("--bf16", action="store_true",
                    help="mixed precision: bfloat16 compute, float32 "
                         "params/stats/loss (see egs/cityscape train)")
parser.add_argument("--tensorboard", action="store_true")
parser.add_argument("--pretrain", action="store_true")
parser.add_argument("--score", action="store_true")

random.seed(0)


def main():
    args = parser.parse_args()
    if args.tensorboard:
        tb.configure(args.dir)

    num_classes = args.num_classes
    num_offsets = args.num_offsets
    offset_list = generate_offsets(80 / args.scale, num_offsets)
    print("offsets are: {}".format(offset_list))

    model = get_model(num_classes, num_offsets, args.arch, args.pretrain,
                  dtype=jnp.bfloat16 if args.bf16 else None)
    trainset = COCODataset(args.train_img, args.train_ann, num_classes,
                           offset_list, scale=args.scale, crop=True,
                           crop_size=args.crop_size, limits=args.limits)
    valset = COCODataset(args.val_img, args.val_ann, num_classes,
                         offset_list, scale=args.scale, mode="train",
                         limits=args.limits)
    trainloader = DataLoader(trainset, batch_size=args.batch_size,
                             shuffle=True, drop_last=True)
    valloader = DataLoader(valset, batch_size=min(4, args.batch_size))
    print("Training samples: {0}\nValidation samples: {1}".format(
        len(trainset), len(valset)))

    steps_per_epoch = max(1, len(trainset) // args.batch_size)
    tx = make_optimizer(lr=args.lr, momentum=args.momentum,
                        weight_decay=args.weight_decay,
                        milestones=args.milestones, gamma=0.2,
                        steps_per_epoch=steps_per_epoch)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               (1, args.crop_size, args.crop_size, 3))
    print("Number of model parameters: {}".format(param_count(state.params)))

    if args.pretrain:
        from mergenet_tpu.utils.weight_import import (
            load_pretrained, resolve_pretrained_path)
        ppath = resolve_pretrained_path(args.arch, args.pretrain)
        if ppath:
            params, batch_stats = load_pretrained(
                state.params, state.batch_stats, ppath, args.arch)
            state = state.replace(params=params, batch_stats=batch_stats)
        else:
            print("WARNING: --pretrain given but no local weights found; "
                  "training from scratch")

    best_iou = float('-inf')
    if args.resume:
        state, meta = load_checkpoint(args.resume, state)
        args.start_epoch = meta.get("epoch", 0) or 0
        best_iou = meta.get("best_iou") or float('-inf')
        if meta.get("offsets"):
            offset_list = meta["offsets"]

    # data axis must divide the (drop_last) global batch (parallel/mesh.py)
    from mergenet_tpu.parallel import data_axis_for_batch
    dp = data_axis_for_batch(args.batch_size)
    mesh = make_mesh(data=dp, devices=jax.devices()[:dp]) if dp > 1 else None
    loss_fn = get_loss_fn(args.loss)
    train_step = build_train_step(num_classes, num_offsets,
                                  alpha=args.alpha,
                                  criterion_ofs=loss_fn, mesh=mesh)
    eval_step = build_eval_step(num_classes, num_offsets, alpha=args.alpha,
                                criterion_ofs=loss_fn, mesh=mesh)

    iterations = args.start_epoch * steps_per_epoch
    for epoch in range(args.start_epoch, args.epochs):
        state, iterations = train(
            trainloader, state, train_step, args.batch_size, epoch,
            iterations, num_classes=num_classes,
            class_nms=trainset.catNms, offset_list=offset_list,
            print_freq=args.print_freq, log_freq=args.log_freq,
            tensorboard=args.tensorboard, score=args.score,
            eval_step=eval_step)
        val_iou = validate(
            valloader, state, eval_step, args.batch_size, epoch,
            iterations, num_classes=num_classes,
            class_nms=trainset.catNms, offset_list=offset_list,
            print_freq=args.print_freq, tensorboard=args.tensorboard,
            score=args.score, pad_to=dp)
        is_best = val_iou > best_iou
        best_iou = max(val_iou, best_iou)
        save_checkpoint(args.dir, state, is_best, epoch=epoch + 1,
                        best_iou=float(best_iou), offsets=offset_list)
    print("Best validation mean iou: ", best_iou)


if __name__ == "__main__":
    main()
