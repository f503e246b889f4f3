"""Inference loops: run the class / offset heads over a dataset and persist
per-image probability maps as `<id>.{class,offset}.npy`.

API parity with reference `utils/inference_utils.py:17-126`
(class_inference / offset_inference / save); the npy layout on disk is the
reference's channel-first (C, H, W) so downstream `segment.py` stages and
the reference's own tooling interoperate.
"""

import os
import time

import jax
import numpy as np

from ..ops.metrics import runningScore, offsetIoU
from .train_utils import AverageMeter


def _forward_sigmoid(state):
    @jax.jit
    def f(img):
        outs = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            img, train=False)
        return jax.nn.sigmoid(outs)
    return f


def class_inference(dataloader, exp_dir, state, n_classes, batch_size,
                    print_freq=10, score=False, class_nms=None,
                    tile_predict_fn=None):
    """Run class-head inference; writes `<exp_dir>/npy/<id>.class.npy`.

    `tile_predict_fn(img) -> probs`, when given, replaces the plain
    sigmoid forward (the full-res sliding-window path, reference
    inference_utils.py:40-44)."""
    batch_time = AverageMeter()
    fwd = tile_predict_fn if tile_predict_fn is not None \
        else _forward_sigmoid(state)
    if score:
        score_metrics = runningScore(n_classes, class_nms)

    outdir = "{}/npy".format(exp_dir)
    os.makedirs(outdir, exist_ok=True)
    end = time.time()
    num_batches = len(dataloader) if hasattr(dataloader, "__len__") else 0
    for i, vals in enumerate(dataloader):
        image_ids = np.asarray(vals[0])
        img = vals[1]
        output = fwd(img)
        if score:
            target = vals[2]
            score_metrics.update(output[..., :n_classes],
                                 np.asarray(target)[..., :n_classes])
        output = np.asarray(output)
        for k, image_id in enumerate(image_ids):
            save(output[k][..., :n_classes], outdir, str(image_id),
                 suffix="class")
        batch_time.update(time.time() - end)
        end = time.time()
        if i % print_freq == 0:
            print("Val: [{0}/{1}]\t"
                  "Time {bt.val:.3f} ({bt.avg:.3f})\t".format(
                      i, num_batches, bt=batch_time))
            if score:
                score_metrics.print_stat()
    if score:
        score_metrics.print_stat()


def offset_inference(dataloader, exp_dir, state, offset_list, batch_size,
                     print_freq=10, score=False):
    """Run offset-head inference; writes `<exp_dir>/npy/<id>.offset.npy`."""
    batch_time = AverageMeter()
    n_offsets = len(offset_list)
    fwd = _forward_sigmoid(state)
    if score:
        offset_metrics = offsetIoU(offset_list)

    outdir = "{}/npy".format(exp_dir)
    os.makedirs(outdir, exist_ok=True)
    end = time.time()
    num_batches = len(dataloader) if hasattr(dataloader, "__len__") else 0
    for i, vals in enumerate(dataloader):
        image_ids = np.asarray(vals[0])
        img = vals[1]
        output = fwd(img)
        if score:
            target = vals[2]
            offset_metrics.update(output[..., -n_offsets:],
                                  np.asarray(target)[..., -n_offsets:])
        output = np.asarray(output)
        for k, image_id in enumerate(image_ids):
            save(output[k][..., -n_offsets:], outdir, str(image_id),
                 suffix="offset")
        batch_time.update(time.time() - end)
        end = time.time()
        if i % print_freq == 0:
            print("Val: [{0}/{1}]\t"
                  "Time {bt.val:.3f} ({bt.avg:.3f})\t".format(
                      i, num_batches, bt=batch_time))
            if score:
                offset_metrics.print_stat()
    if score:
        offset_metrics.print_stat()


def save(pred, outdir, name, suffix="class"):
    """Persist one image's probability planes as
    `<outdir>/<name>.<suffix>.npy` in the reference's channel-first (C, H, W)
    float32 layout (reference inference_utils.py:122-126)."""
    arr = np.asarray(pred, dtype=np.float32)
    if arr.ndim == 3:  # NHWC slice (H, W, C) -> (C, H, W)
        arr = np.moveaxis(arr, -1, 0)
    filename = outdir + "/" + name + "." + suffix + ".npy"
    np.save(filename, arr)
