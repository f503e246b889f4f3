"""Epoch-level training / validation loops.

API parity with reference `utils/train_utils.py` (train / validate / sample
/ save_checkpoint / AverageMeter / generate_offsets), adapted to JAX idiom:
the (model, optimizer/criterion) arguments become (state, step_fn) — the
jitted SPMD step built by `mergenet_tpu.parallel.build_train_step` /
`build_eval_step` already closes over the loss functions and mesh sharding.

Data convention: loaders yield numpy (img, target) batches in NHWC
(N, H, W, 3) / (N, H, W, C+O) float32.
"""

import math
import os
import time

import jax
import numpy as np

from ..core.offsets import generate_offsets  # re-export (reference home)
from ..ops.metrics import runningScore, offsetIoU
from . import logging as tb
from .checkpoint import save_checkpoint as _save_ckpt

__all__ = ["train", "validate", "sample", "save_checkpoint", "AverageMeter",
           "generate_offsets"]


class AverageMeter(object):
    """Computes and stores the average and current value
    (reference train_utils.py:298-314)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0
        self.avg = 0
        self.sum = 0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def train(trainloader, state, train_step, batch_size, epoch, iterations,
          num_classes=0, class_nms=None, offset_list=None,
          print_freq=10, log_freq=1000, tensorboard=False, score=False,
          eval_step=None, rng=None, lr_for_log=None):
    """Train for one epoch; returns (state, iterations).

    `train_step(state, img, target, rng) -> (state, metrics)` is the jitted
    step from `build_train_step`.  When `score=True`, `eval_step` (from
    `build_eval_step`) is used to compute IoU metrics on the training
    batches (reference train_utils.py:83-88,108-122).
    """
    with_class = num_classes > 0
    with_offset = offset_list is not None and len(offset_list) > 0
    cls_losses, ofs_losses = AverageMeter(), AverageMeter()
    all_losses, batch_time = AverageMeter(), AverageMeter()
    if score and with_class:
        score_metrics = runningScore(num_classes, class_nms)
    if score and with_offset:
        offset_metrics = offsetIoU(offset_list)
    if tensorboard and lr_for_log is not None:
        tb.log_value("learning_rate", lr_for_log, epoch)
    rng = rng if rng is not None else jax.random.PRNGKey(epoch)

    end = time.time()
    num_batches = len(trainloader) if hasattr(trainloader, "__len__") else 0
    for i, (img, target) in enumerate(trainloader):
        rng, step_rng = jax.random.split(rng)
        state, metrics = train_step(state, img, target, step_rng)
        iterations += 1

        if score and (with_class or with_offset) and eval_step is not None:
            probs, _ = eval_step(state, img, target)
            if with_class:
                score_metrics.update(probs[..., :num_classes],
                                     target[..., :num_classes])
            if with_offset:
                offset_metrics.update(probs[..., num_classes:],
                                      target[..., num_classes:])

        # meters (device->host sync happens here, once per step)
        all_losses.update(float(metrics["loss"]), batch_size)
        if with_class:
            cls_losses.update(float(metrics["cls_loss"]), batch_size)
        if with_offset:
            ofs_losses.update(float(metrics["ofs_loss"]), batch_size)
        batch_time.update(time.time() - end)
        end = time.time()

        if i % print_freq == 0:
            print("Train: [{0}][{1}/{2}]\t"
                  "Time {bt.val:.3f} ({bt.avg:.3f})\t"
                  "Loss {loss.val:.4f} ({loss.avg:.4f})".format(
                      epoch, i, num_batches, bt=batch_time,
                      loss=all_losses))
        if tensorboard and iterations % log_freq == 0:
            if with_class:
                tb.log_value("train_cls_loss", cls_losses.avg,
                             int(iterations / log_freq))
            if with_offset:
                tb.log_value("train_ofs_loss", ofs_losses.avg,
                             int(iterations / log_freq))

    if score and with_class:
        scores, _ = score_metrics.get_scores()
        if tensorboard:
            tb.log_value("train_iou", scores["mean_IU"], epoch)
        score_metrics.print_stat()
    if score and with_offset:
        iou, mean_iou = offset_metrics.get_scores()
        if tensorboard:
            tb.log_value("train_ofs_miou", mean_iou, epoch)
        offset_metrics.print_stat()

    return state, iterations


def train_compact(batches, state, train_step, batch_size, epoch,
                  iterations, print_freq=10, log_freq=1000,
                  tensorboard=False, rng=None):
    """Train one epoch over COMPACT grain batches (the production input
    pipeline): dicts of image uint8 / mask int32 / object_class int32, fed
    to `build_train_step_compact` which normalizes and builds the
    (C + O)-plane target ON DEVICE.  The host ships ~20x less data per
    batch than the host-target `train` loop.  Returns (state, iterations).
    """
    all_losses, batch_time = AverageMeter(), AverageMeter()
    cls_losses, ofs_losses = AverageMeter(), AverageMeter()
    rng = rng if rng is not None else jax.random.PRNGKey(epoch)
    end = time.time()
    for i, batch in enumerate(batches):
        rng, step_rng = jax.random.split(rng)
        state, metrics = train_step(state, batch["image"], batch["mask"],
                                    batch["object_class"], step_rng)
        iterations += 1
        all_losses.update(float(metrics["loss"]), batch_size)
        cls_losses.update(float(metrics["cls_loss"]), batch_size)
        ofs_losses.update(float(metrics["ofs_loss"]), batch_size)
        batch_time.update(time.time() - end)
        end = time.time()
        if i % print_freq == 0:
            print("Train(grain): [{0}][{1}]\t"
                  "Time {bt.val:.3f} ({bt.avg:.3f})\t"
                  "Loss {loss.val:.4f} ({loss.avg:.4f})".format(
                      epoch, i, bt=batch_time, loss=all_losses))
        if tensorboard and iterations % log_freq == 0:
            tb.log_value("train_cls_loss", cls_losses.avg,
                         int(iterations / log_freq))
            tb.log_value("train_ofs_loss", ofs_losses.avg,
                         int(iterations / log_freq))
    return state, iterations


def _pad_batch(arr, multiple):
    """Pad the batch dim up to a multiple by repeating the last sample
    (GSPMD data-sharding divisibility); returns (padded, n_real)."""
    n = arr.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return arr, n
    a = np.asarray(arr)
    return np.concatenate([a, np.repeat(a[-1:], pad, 0)], 0), n


def validate(validateloader, state, eval_step, batch_size, epoch, iterations,
             num_classes=0, class_nms=None, offset_list=None,
             print_freq=10, log_freq=1000, tensorboard=False, score=False,
             pad_to=1):
    """Validate; returns the model-selection signal mean_iou (class IoU +
    offset IoU when both heads are active, reference
    train_utils.py:221-227).  Requires score=True for a meaningful value;
    otherwise returns -avg_loss (still 'higher is better').

    `pad_to` (the mesh's data-axis size) pads partial batches by
    repeating the last sample so sharded eval steps see a divisible
    batch; score metrics AND the loss meters count only the real rows
    (the loss uses the eval step's `per_sample_*` vectors, so padded
    duplicates never skew the -avg_loss selection signal)."""
    with_class = num_classes > 0
    with_offset = offset_list is not None and len(offset_list) > 0
    cls_losses, ofs_losses = AverageMeter(), AverageMeter()
    all_losses, batch_time = AverageMeter(), AverageMeter()
    if score and with_class:
        score_metrics = runningScore(num_classes, class_nms)
    if score and with_offset:
        offset_metrics = offsetIoU(offset_list)

    end = time.time()
    num_batches = len(validateloader) if hasattr(validateloader, "__len__") \
        else 0
    for i, batch in enumerate(validateloader):
        img, target = batch[-2], batch[-1]  # tolerate (id, img, target)
        if pad_to > 1:
            img, n_real = _pad_batch(img, pad_to)
            target, _ = _pad_batch(target, pad_to)
        else:
            n_real = img.shape[0]
        probs, metrics = eval_step(state, img, target)
        if "per_sample_loss" in metrics:
            def _real_mean(key):
                return float(np.mean(np.asarray(metrics[key])[:n_real]))
            all_losses.update(_real_mean("per_sample_loss"), n_real)
            if with_class:
                cls_losses.update(_real_mean("per_sample_cls"), n_real)
            if with_offset:
                ofs_losses.update(_real_mean("per_sample_ofs"), n_real)
        else:
            all_losses.update(float(metrics["loss"]), batch_size)
            if with_class:
                cls_losses.update(float(metrics["cls_loss"]), batch_size)
            if with_offset:
                ofs_losses.update(float(metrics["ofs_loss"]), batch_size)
        if score and with_class:
            score_metrics.update(probs[:n_real, ..., :num_classes],
                                 target[:n_real, ..., :num_classes])
        if score and with_offset:
            offset_metrics.update(probs[:n_real, ..., num_classes:],
                                  target[:n_real, ..., num_classes:])
        batch_time.update(time.time() - end)
        end = time.time()
        if i % print_freq == 0:
            print("Val: [{0}][{1}/{2}]\t"
                  "Time {bt.val:.3f} ({bt.avg:.3f})\t"
                  "Loss {loss.val:.4f} ({loss.avg:.4f})".format(
                      epoch, i, num_batches, bt=batch_time,
                      loss=all_losses))

    if tensorboard:
        if with_class:
            tb.log_value("val_cls_loss", cls_losses.avg,
                         int(max(iterations, 1) / log_freq))
        if with_offset:
            tb.log_value("val_ofs_loss", ofs_losses.avg,
                         int(max(iterations, 1) / log_freq))

    mean_cls_iou = mean_ofs_iou = None
    if score and with_class:
        scores, _ = score_metrics.get_scores()
        mean_cls_iou = scores["mean_IU"]
        if tensorboard:
            tb.log_value("val_iou", mean_cls_iou, epoch)
        score_metrics.print_stat()
    if score and with_offset:
        _, mean_ofs_iou = offset_metrics.get_scores()
        if tensorboard:
            tb.log_value("val_ofs_miou", mean_ofs_iou, epoch)
        offset_metrics.print_stat()

    if mean_cls_iou is not None and mean_ofs_iou is not None:
        return mean_cls_iou + mean_ofs_iou
    if mean_cls_iou is not None:
        return mean_cls_iou
    if mean_ofs_iou is not None:
        return mean_ofs_iou
    return -all_losses.avg


def _save_plane_png(path, plane):
    """Write a [0,1] float (H, W) plane as an 8-bit grayscale png."""
    import cv2
    arr = np.clip(np.asarray(plane), 0.0, 1.0)
    cv2.imwrite(path, (arr * 255).astype(np.uint8))


def sample(state, eval_step, dataloader, outdir, n_classes, n_offsets,
           pad_to=1):
    """Dump one batch's targets and sigmoid predictions as pngs for
    eyeballing (reference train_utils.py:231-283)."""
    os.makedirs(outdir, exist_ok=True)
    batch = next(iter(dataloader))
    img, target = batch[-2], batch[-1]
    if pad_to > 1:
        img, _ = _pad_batch(img, pad_to)
        target, _ = _pad_batch(target, pad_to)
    img = np.asarray(img)
    _save_plane_png("{0}/raw.png".format(outdir), img[0])
    for i in range(n_classes):
        _save_plane_png("{0}/class_{1}.png".format(outdir, i),
                        np.asarray(target)[0, :, :, i])
    for i in range(n_offsets):
        _save_plane_png("{0}/bound_{1}.png".format(outdir, i),
                        np.asarray(target)[0, :, :, n_classes + i])
    probs, _ = eval_step(state, img, target)
    probs = np.asarray(probs)
    for i in range(n_classes):
        _save_plane_png("{0}/class_{1}pred.png".format(outdir, i),
                        probs[0, :, :, i])
    for i in range(n_offsets):
        _save_plane_png("{0}/bound_{1}pred.png".format(outdir, i),
                        probs[0, :, :, n_classes + i])


def save_checkpoint(dir, state, is_best, filename="checkpoint", **meta):
    """Orbax checkpoint save (see utils/checkpoint.py); keeps the reference
    call shape save_checkpoint(dir, state, is_best)."""
    _save_ckpt(dir, state, is_best, filename=filename, **meta)
