"""Shared test fixtures: synthetic oracle inputs for the merge decoder.

Mirrors the reference's "oracle mode" end-to-end fixture
(reference `egs/coco/local/segment.py:42-45,151-153`, `dataset.py:166-173`):
feed ground-truth class/sameness maps into the decoder and expect the
decoded instances to reproduce the ground truth.
"""

import numpy as np


def make_instance_scene(H=24, W=32, seed=0):
    """A tiny scene: background (instance 0 / class 0) plus two rectangles
    of classes 1 and 2.  Returns (instance_mask, class_of_instance)."""
    inst = np.zeros((H, W), dtype=np.int32)
    inst[3:10, 4:12] = 1
    inst[12:20, 14:28] = 2
    classes = {0: 0, 1: 1, 2: 2}
    return inst, classes


def oracle_probs(inst, classes, num_classes, offsets, conf=0.9):
    """Build near-one-hot class probs + sameness probs from ground truth."""
    H, W = inst.shape
    O = len(offsets)
    class_probs = np.full((num_classes, H, W), (1 - conf) / (num_classes - 1),
                          dtype=np.float32)
    for i, c in classes.items():
        class_probs[c][inst == i] = conf

    sameness = np.zeros((O, H, W), dtype=np.float32)
    for oi, (di, dj) in enumerate(offsets):
        rolled = np.roll(np.roll(inst, -di, axis=0), -dj, axis=1)
        same = (rolled == inst).astype(np.float32)
        plane = same * conf + (1 - same) * (1 - conf)
        # out-of-bounds comparisons are "same" by convention (border pixels)
        if di < 0:
            plane[:-di, :] = conf
        elif di > 0:
            plane[-di:, :] = conf
        if dj < 0:
            plane[:, :-dj] = conf
        elif dj > 0:
            plane[:, -dj:] = conf
        sameness[oi] = plane
    return class_probs, sameness


def instances_equivalent(mask_a, classes_a, mask_b, classes_b):
    """True when two instance decompositions are identical up to relabeling."""
    import itertools
    ids_a = sorted(set(int(v) for v in np.unique(mask_a)) - {0})
    ids_b = sorted(set(int(v) for v in np.unique(mask_b)) - {0})
    if len(ids_a) != len(ids_b):
        return False
    # match by exact pixel sets
    for ia in ids_a:
        pix = mask_a == ia
        matched = False
        for ib in ids_b:
            if np.array_equal(pix, mask_b == ib):
                if classes_a[ia - 1] != classes_b[ib - 1]:
                    return False
                matched = True
                break
        if not matched:
            return False
    return True


def matches_ground_truth(mask, object_class, inst, classes):
    """Decoded instances exactly reproduce the ground-truth instances."""
    gt_ids = sorted(set(int(v) for v in np.unique(inst)) - {0})
    dec_ids = sorted(set(int(v) for v in np.unique(mask)) - {0})
    if len(gt_ids) != len(dec_ids):
        return False
    for g in gt_ids:
        pix = inst == g
        found = False
        for d in dec_ids:
            if np.array_equal(pix, mask == d):
                if object_class[d - 1] != classes[g]:
                    return False
                found = True
                break
        if not found:
            return False
    return True
