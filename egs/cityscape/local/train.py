#!/usr/bin/env python3
"""Cityscapes instance-segmentation training (TPU / JAX).

CLI parity with reference `egs/cityscape/local/train.py:21-85` — same flags
(dir, --epochs, --start-epoch, --resume, --batch-size, --mode, --crop-size,
--scale, --loss, --alpha, --lr, --momentum, --milestones, --arch,
--num-classes, --num-offsets, --nesterov, --weight-decay, --train-img,
--val-img, --train-ann, --val-ann, --limits, --tensorboard, --pretrain,
--crop, --score) — running on the mergenet_tpu stack: pjit data-parallel
train step, optax SGD + MultiStepLR, orbax checkpoints with the offset list
persisted (the inference stage reads offsets from the checkpoint).
"""

import argparse
import os
import random

import numpy as np

import jax
import jax.numpy as jnp

from mergenet_tpu.models import get_model, init_model, param_count
from mergenet_tpu.data import AllDataset, ClassDataset, OffsetDataset, \
    DataLoader
from mergenet_tpu.ops.losses import get_loss_fn
from mergenet_tpu.parallel import (make_mesh, make_optimizer,
                                   create_train_state, build_train_step,
                                   build_eval_step)
from mergenet_tpu.utils import train, validate, sample, generate_offsets
from mergenet_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from mergenet_tpu.utils import logging as tb

parser = argparse.ArgumentParser(
    description="TPU cityscape instance segmentation setup")
parser.add_argument("dir", type=str,
                    help="directory of output models and logs")
parser.add_argument("--epochs", default=10, type=int)
parser.add_argument("--start-epoch", default=0, type=int)
parser.add_argument("--resume", default="", type=str,
                    help="path to latest checkpoint dir (default: none)")
parser.add_argument("--print-freq", "-p", default=10, type=int)
parser.add_argument("--log-freq", default=1000, type=int)
parser.add_argument("--visual-freq", default=0, type=int)
parser.add_argument("-b", "--batch-size", default=16, type=int)
parser.add_argument("--mode", default="all", type=str,
                    choices=["all", "class", "offset"])
parser.add_argument("--crop-size", default=None, type=int)
parser.add_argument("--scale", default=1, type=int)
parser.add_argument("--loss", default="bce", type=str,
                    choices=["bce", "mbce", "dice", "ce"])
parser.add_argument("--alpha", default=1, type=float,
                    help="weight of offset losses")
parser.add_argument("--aux-weight", default=0.0, type=float,
                    help="deep-supervision weight for aux-head models "
                         "(pspnet)")
parser.add_argument("--lr", "--learning-rate", default=0.01, type=float)
parser.add_argument("--momentum", default=0.9, type=float)
parser.add_argument("--milestones", default=None, nargs="+", type=int)
parser.add_argument("--arch", default="pspfpnet", type=str)
parser.add_argument("--num-classes", default=9, type=int)
parser.add_argument("--num-offsets", default=10, type=int)
parser.add_argument("--nesterov", default=True, type=bool)
parser.add_argument("--weight-decay", "--wd", default=1e-4, type=float)
parser.add_argument("--train-img", default="data/train", type=str)
parser.add_argument("--val-img", default="data/val", type=str)
parser.add_argument(
    "--train-ann", type=str,
    default="data/annotations/instancesonly_filtered_gtFine_train.json")
parser.add_argument(
    "--val-ann", type=str,
    default="data/annotations/instancesonly_filtered_gtFine_val.json")
parser.add_argument("--limits", default=None, type=int)
parser.add_argument("--val-limits", default=None, type=int,
                    help="cap the validation set independently of "
                         "--limits (the per-epoch val pass builds host "
                         "targets; large val sets dominate epoch time)")
parser.add_argument("--input-pipeline", default="loader", type=str,
                    choices=["loader", "grain"],
                    help="'loader' = host-built float32 targets through "
                         "DataLoader (reference train.py:165-168 "
                         "semantics); 'grain' = the production pipeline: "
                         "compact uint8/int32 records, targets built ON "
                         "DEVICE inside the jitted step (~20x less "
                         "host->device traffic; mode=all only)")
parser.add_argument("--remat", action="store_true",
                    help="rematerialize the forward during backprop "
                         "(jax.checkpoint): trades ~30%% step time for "
                         "activation memory -> bigger batch/crop per chip")
parser.add_argument("--bf16", action="store_true",
                    help="mixed precision: bfloat16 compute (convs/BN), "
                         "float32 params, BN stats, logits and loss — the "
                         "TPU-native equivalent of torch.cuda.amp (the "
                         "reference trains pure float32)")
parser.add_argument("--tensorboard", action="store_true")
parser.add_argument("--pretrain", action="store_true")
parser.add_argument("--crop", action="store_true")
parser.add_argument("--score", action="store_true")
parser.add_argument("--seed", default=0, type=int,
                    help="training seed: model init + per-epoch step rng + "
                         "grain shuffle/crop seeds")

best_iou = float('-inf')
random.seed(0)


def _check_catids(parser, train_ids, val_ids):
    """Train targets are built from the train json's category order, val
    metrics/targets from the val json's; a silent mismatch would misalign
    class channels, so fail loudly (both lists include the background 0)."""
    if train_ids != val_ids:
        parser.error(
            "--train-ann and --val-ann disagree on category ids/order "
            "({} vs {}): training targets and val metrics would use "
            "different class channels".format(train_ids, val_ids))


def main():
    global best_iou
    args = parser.parse_args()
    if args.tensorboard:
        print("Using tensorboard")
        tb.configure(args.dir)

    num_classes = args.num_classes
    num_offsets = args.num_offsets
    if args.mode == "offset":
        num_classes = 0
    if args.mode == "class":
        num_offsets = 0

    model = get_model(num_classes, num_offsets, args.arch, args.pretrain,
                      dtype=jnp.bfloat16 if args.bf16 else None)

    use_grain = args.input_pipeline == "grain"
    if use_grain and not args.crop_size:
        # the grain pipeline batches fixed-size random crops; silently
        # defaulting a crop size would train differently from the
        # loader path's full-image (no --crop) semantics
        parser.error("--input-pipeline grain requires --crop-size")

    # datasets
    grain_source = None
    if args.mode == "all":
        offset_list = generate_offsets(80 / args.scale, args.num_offsets)
        if use_grain:
            from mergenet_tpu.data.grain_pipeline import CocoInstanceSource
            trainset = grain_source = CocoInstanceSource(
                args.train_img, args.train_ann, scale=args.scale,
                limits=args.limits)
        else:
            trainset = AllDataset(args.train_img, args.train_ann,
                                  num_classes, offset_list,
                                  scale=args.scale, crop=args.crop,
                                  crop_size=args.crop_size,
                                  limits=args.limits)
        valset = AllDataset(args.val_img, args.val_ann, num_classes,
                            offset_list, scale=args.scale, mode="train",
                            limits=args.val_limits or args.limits)
        class_nms = valset.catNms
        _check_catids(parser, trainset.catIds, valset.catIds)
    elif args.mode == "class":
        offset_list = None
        if use_grain:
            # class-only targets: the compact step one-hots the class
            # planes on device (offsets=() selects the class slice)
            from mergenet_tpu.data.grain_pipeline import CocoInstanceSource
            trainset = grain_source = CocoInstanceSource(
                args.train_img, args.train_ann, scale=args.scale,
                limits=args.limits)
        else:
            trainset = ClassDataset(args.train_img, args.train_ann,
                                    scale=args.scale, crop=args.crop,
                                    crop_size=args.crop_size,
                                    limits=args.limits)
        valset = ClassDataset(args.val_img, args.val_ann, scale=args.scale,
                              mode="train",
                              limits=args.val_limits or args.limits)
        class_nms = valset.catNms
        _check_catids(parser, trainset.catIds, valset.catIds)
    else:  # offset
        offset_list = generate_offsets(80 / args.scale, args.num_offsets)
        print("offsets are: {}".format(offset_list))
        if use_grain:
            # offset-only targets: num_classes=0 selects the sameness
            # planes at device-side target build
            from mergenet_tpu.data.grain_pipeline import CocoInstanceSource
            trainset = grain_source = CocoInstanceSource(
                args.train_img, args.train_ann, scale=args.scale,
                limits=args.limits)
        else:
            trainset = OffsetDataset(args.train_img, args.train_ann,
                                     offset_list, scale=args.scale,
                                     crop=args.crop,
                                     crop_size=args.crop_size,
                                     limits=args.limits)
        valset = OffsetDataset(args.val_img, args.val_ann, offset_list,
                               scale=args.scale, mode="train",
                               limits=args.val_limits or args.limits)
        class_nms = None

    trainloader = None if use_grain else DataLoader(
        trainset, batch_size=args.batch_size, shuffle=True, drop_last=True)
    valloader = DataLoader(valset, batch_size=min(4, args.batch_size))
    print("Training samples: {0}\nValidation samples: {1}".format(
        len(trainset), len(valset)))

    # optimizer + state
    steps_per_epoch = max(1, len(trainset) // args.batch_size)
    tx = make_optimizer(lr=args.lr, momentum=args.momentum,
                        nesterov=args.nesterov,
                        weight_decay=args.weight_decay,
                        milestones=args.milestones, gamma=0.2,
                        steps_per_epoch=steps_per_epoch)
    init_hw = args.crop_size if args.crop_size else 128
    state = create_train_state(model, tx, jax.random.PRNGKey(args.seed),
                               (1, init_hw, init_hw, 3))
    print("Number of model parameters: {}".format(
        param_count(state.params)))

    if args.pretrain:
        # reference semantics: initialize the backbone from pretrained
        # weights (models/resnet.py:214-222).  Zero-egress: looks for a
        # local file under ./pretrained or $MERGENET_PRETRAINED_DIR
        # (torchvision-style backbone or full reference checkpoint).
        from mergenet_tpu.utils.weight_import import (
            load_pretrained, resolve_pretrained_path)
        ppath = resolve_pretrained_path(args.arch, args.pretrain)
        if ppath:
            params, batch_stats = load_pretrained(
                state.params, state.batch_stats, ppath, args.arch)
            state = state.replace(params=params, batch_stats=batch_stats)
        else:
            print("WARNING: --pretrain given but no local weights found "
                  "(./pretrained or $MERGENET_PRETRAINED_DIR); "
                  "training from scratch")

    if args.resume:
        state, meta = load_checkpoint(args.resume, state)
        args.start_epoch = meta.get("epoch", args.start_epoch) or 0
        best_iou = meta.get("best_iou") or float('-inf')
        if meta.get("offsets"):
            offset_list = meta["offsets"]
            print("offsets are: {}".format(offset_list))
        print("=> loaded checkpoint '{}' (epoch {})".format(
            args.resume, args.start_epoch))

    # data axis must divide the (drop_last) global batch; sub-mesh when the
    # toy batch is smaller than the device count (parallel/mesh.py)
    from mergenet_tpu.parallel import data_axis_for_batch
    dp = data_axis_for_batch(args.batch_size)
    mesh = make_mesh(data=dp, devices=jax.devices()[:dp]) if dp > 1 else None
    loss_fn = get_loss_fn(args.loss)
    if use_grain:
        from mergenet_tpu.parallel import build_train_step_compact
        train_step = build_train_step_compact(
            num_classes,
            tuple(tuple(o) for o in offset_list) if num_offsets else (),
            alpha=args.alpha,
            criterion_cls=get_loss_fn("bce") if num_classes else None,
            criterion_ofs=loss_fn if num_offsets else None,
            mesh=mesh, remat=args.remat,
            aux_weight=args.aux_weight if args.arch == "pspnet" else 0.0)
    else:
        train_step = build_train_step(
            num_classes, num_offsets, alpha=args.alpha,
            criterion_cls=get_loss_fn("bce") if num_classes else None,
            criterion_ofs=loss_fn if num_offsets else None, mesh=mesh,
            remat=args.remat,
            aux_weight=args.aux_weight if args.arch == "pspnet" else 0.0)
    eval_step = build_eval_step(
        num_classes, num_offsets, alpha=args.alpha,
        criterion_cls=get_loss_fn("bce") if num_classes else None,
        criterion_ofs=loss_fn if num_offsets else None, mesh=mesh)

    iterations = args.start_epoch * steps_per_epoch
    for epoch in range(args.start_epoch, args.epochs):
        if use_grain:
            from mergenet_tpu.data.grain_pipeline import make_train_pipeline
            from mergenet_tpu.utils.train_utils import train_compact
            batches, _ = make_train_pipeline(
                args.train_img, args.train_ann,
                batch_size=args.batch_size,
                crop_size=args.crop_size, scale=args.scale,
                limits=args.limits, seed=args.seed * 10007 + epoch,
                source=grain_source)
            state, iterations = train_compact(
                batches, state, train_step, args.batch_size, epoch,
                iterations, print_freq=args.print_freq,
                log_freq=args.log_freq, tensorboard=args.tensorboard,
                rng=jax.random.PRNGKey(args.seed * 131 + epoch))
        else:
            state, iterations = train(
                trainloader, state, train_step, args.batch_size, epoch,
                iterations, num_classes=num_classes, class_nms=class_nms,
                offset_list=offset_list, print_freq=args.print_freq,
                log_freq=args.log_freq, tensorboard=args.tensorboard,
                score=args.score, eval_step=eval_step)
        val_iou = validate(
            valloader, state, eval_step, args.batch_size, epoch, iterations,
            num_classes=num_classes, class_nms=class_nms,
            offset_list=offset_list, print_freq=args.print_freq,
            log_freq=args.log_freq, tensorboard=args.tensorboard,
            score=args.score, pad_to=dp)
        if args.visual_freq > 0 and epoch % args.visual_freq == 0:
            outdir = "{}/imgs/{}".format(args.dir, epoch)
            os.makedirs(outdir, exist_ok=True)
            sample(state, eval_step, valloader, outdir, num_classes,
                   num_offsets, pad_to=dp)
        is_best = val_iou > best_iou
        best_iou = max(val_iou, best_iou)
        save_checkpoint(args.dir, state, is_best, epoch=epoch + 1,
                        best_iou=float(best_iou),
                        offsets=offset_list if args.mode != "class"
                        else None)
    print("Best validation mean iou: ", best_iou)


if __name__ == "__main__":
    main()
