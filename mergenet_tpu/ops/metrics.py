"""Scoring metrics: semantic-segmentation confusion-matrix scores and
per-offset sameness IoU.

API parity with reference `utils/score.py:10-103` (`runningScore`,
`offsetIoU`) but framework-free: updates accept numpy or JAX arrays in
channel-last (..., H, W, C) layout, and a jit-friendly confusion-matrix
kernel does the heavy counting on device.
"""

import jax
import jax.numpy as jnp
import numpy as np


import functools


@functools.partial(jax.jit, static_argnums=2)
def _confusion_matrix(gt_labels, pred_labels, n_class):
    """Bincount-based confusion matrix, jittable."""
    idx = gt_labels.reshape(-1) * n_class + pred_labels.reshape(-1)
    return jnp.bincount(idx, length=n_class * n_class).reshape(
        n_class, n_class)


class runningScore:
    """Confusion-matrix semantic-seg metrics (overall/mean acc, mean IU,
    fwavacc).  update() takes (..., H, W, C) prob/one-hot planes."""

    def __init__(self, n_classes, class_nms=None):
        self.n_classes = n_classes
        self.class_nms = (class_nms if class_nms is not None
                          else [str(i) for i in range(n_classes)])
        self.confusion_matrix = np.zeros((n_classes, n_classes),
                                         dtype=np.int64)

    def update(self, label_preds, label_truths):
        """label_preds/label_truths: (..., H, W, C>=n_classes) arrays; the
        class decision is the channel argmax over the first n_classes."""
        pred = jnp.argmax(jnp.asarray(label_preds)[..., :self.n_classes],
                          axis=-1)
        gt = jnp.argmax(jnp.asarray(label_truths)[..., :self.n_classes],
                        axis=-1)
        cm = _confusion_matrix(gt, pred, self.n_classes)
        self.confusion_matrix += np.asarray(cm)

    def get_scores(self):
        hist = self.confusion_matrix.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            acc = np.diag(hist).sum() / hist.sum()
            acc_cls = np.nanmean(np.diag(hist) / hist.sum(axis=1))
            iu = np.diag(hist) / (hist.sum(axis=1) + hist.sum(axis=0)
                                  - np.diag(hist))
            mean_iu = np.nanmean(iu)
            freq = hist.sum(axis=1) / hist.sum()
            fwavacc = (freq[freq > 0] * iu[freq > 0]).sum()
        cls_iu = dict(zip(self.class_nms, iu))
        return {"overall_acc": acc, "mean_acc": acc_cls,
                "freq_acc": fwavacc, "mean_IU": mean_iu}, cls_iu

    def reset(self):
        self.confusion_matrix = np.zeros(
            (self.n_classes, self.n_classes), dtype=np.int64)

    def print_stat(self):
        score, class_iou = self.get_scores()
        print("class\t IoU")
        for class_nm in self.class_nms:
            print("{}\t{}".format(class_nm, class_iou[class_nm]))
        print("mean IoU\t{}".format(score["mean_IU"]))
        print("pixel acc\t{}".format(score["overall_acc"]))


class offsetIoU:
    """IoU of the complemented sameness planes, per offset — i.e. how well
    the model finds the 'different' (boundary) pixels
    (reference `score.py:69-103`)."""

    def __init__(self, offset_list):
        self.offset_list = list(offset_list)
        self.num_offsets = len(self.offset_list)
        self.reset()

    def update(self, pred, gt):
        """pred/gt: (..., H, W, O) sameness prob planes (last O channels)."""
        p = 1.0 - np.asarray(pred)[..., -self.num_offsets:].astype(np.float64)
        g = 1.0 - np.asarray(gt)[..., -self.num_offsets:].astype(np.float64)
        p = p.reshape(-1, self.num_offsets)
        g = g.reshape(-1, self.num_offsets)
        intersection = (p * g).sum(axis=0)
        self.intersection += intersection
        self.union += p.sum(axis=0) + g.sum(axis=0) - intersection

    def reset(self):
        self.intersection = np.zeros(self.num_offsets)
        self.union = np.zeros(self.num_offsets)
        self.iou = np.zeros(self.num_offsets)

    def get_scores(self):
        with np.errstate(divide="ignore", invalid="ignore"):
            self.iou = self.intersection / self.union
        return self.iou, self.iou.mean()

    def print_stat(self):
        iou, miou = self.get_scores()
        print("offset\t IoU")
        for i, offset in enumerate(self.offset_list):
            print("{}\t{}".format(offset, iou[i]))
        print("mean IoU\t {}".format(miou))
