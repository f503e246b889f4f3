"""Tests for target building, losses, and metrics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mergenet_tpu.ops import (
    mask_to_target, bce_with_logits_loss, weighted_bce_with_logits_loss,
    multi_bce_with_logits_loss, soft_dice_loss, cross_entropy_one_hot_loss,
    fused_class_offset_loss, get_loss_fn, runningScore, offsetIoU)
from mergenet_tpu.ops.targets import mask_to_target_np, mask_to_target_batch

from helpers import make_instance_scene

OFFSETS = ((1, 0), (0, 1), (-2, -1), (3, 2))
NUM_CLASSES = 3


def test_mask_to_target_matches_numpy():
    inst, classes = make_instance_scene()
    oc = np.zeros(8, dtype=np.int32)
    for i, c in classes.items():
        oc[i] = c
    dev = np.asarray(mask_to_target(jnp.asarray(inst), jnp.asarray(oc),
                                    NUM_CLASSES, OFFSETS))
    host = mask_to_target_np(inst, oc, NUM_CLASSES, OFFSETS)
    assert dev.shape == (inst.shape[0], inst.shape[1],
                         NUM_CLASSES + len(OFFSETS))
    np.testing.assert_array_equal(dev, host)


def test_target_class_planes_one_hot():
    inst, classes = make_instance_scene()
    oc = np.zeros(8, dtype=np.int32)
    for i, c in classes.items():
        oc[i] = c
    t = np.asarray(mask_to_target(jnp.asarray(inst), jnp.asarray(oc),
                                  NUM_CLASSES, OFFSETS))
    np.testing.assert_allclose(t[..., :NUM_CLASSES].sum(-1), 1.0)
    # instance-1 pixels labeled class 1
    assert t[5, 6, 1] == 1.0


def test_target_border_convention():
    """Out-of-bounds comparisons are 'same' — sign-correct for positive and
    negative offsets (the reference AllDataset got positive offsets wrong;
    we use the OffsetDataset logic, dataset.py:266-276)."""
    inst = np.zeros((8, 8), dtype=np.int32)
    oc = np.zeros(2, dtype=np.int32)
    offs = ((3, 0), (-3, 0))
    t = np.asarray(mask_to_target(jnp.asarray(inst), jnp.asarray(oc),
                                  0, offs))
    # +3 row offset: last 3 rows have no partner -> 1 (they are anyway 1
    # here since the scene is uniform); check via a striped scene instead
    inst = (np.arange(8)[:, None] // 4 * np.ones((1, 8))).astype(np.int32)
    oc = np.zeros(2, dtype=np.int32)
    t = np.asarray(mask_to_target(jnp.asarray(inst), jnp.asarray(oc),
                                  0, offs))
    # offset (3,0): rows 5..7 out of bounds -> forced 1
    assert (t[5:, :, 0] == 1).all()
    # rows 1..3 compare against the other stripe -> 0
    assert (t[1:4, :, 0] == 0).all()
    # offset (-3,0): rows 0..2 out of bounds -> forced 1
    assert (t[:3, :, 1] == 1).all()
    assert (t[4:7, :, 1] == 0).all()


def test_mask_to_target_batch():
    inst, classes = make_instance_scene()
    oc = np.zeros(8, dtype=np.int32)
    for i, c in classes.items():
        oc[i] = c
    masks = jnp.stack([jnp.asarray(inst)] * 2)
    ocs = jnp.stack([jnp.asarray(oc)] * 2)
    t = mask_to_target_batch(masks, ocs, NUM_CLASSES, OFFSETS)
    assert t.shape == (2, inst.shape[0], inst.shape[1],
                       NUM_CLASSES + len(OFFSETS))


def _rand_logits_targets(seed=0, shape=(2, 8, 8, 5)):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(*shape).astype(np.float32))
    targets = jnp.asarray((rng.rand(*shape) > 0.5).astype(np.float32))
    return logits, targets


def test_bce_matches_manual():
    logits, targets = _rand_logits_targets()
    p = jax.nn.sigmoid(logits)
    manual = -jnp.mean(targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p))
    got = bce_with_logits_loss(logits, targets)
    np.testing.assert_allclose(np.asarray(got), np.asarray(manual), rtol=1e-5)


def test_weighted_bce_alpha_half_is_half_bce():
    logits, targets = _rand_logits_targets()
    got = weighted_bce_with_logits_loss(logits, targets, alpha=0.5)
    ref = bce_with_logits_loss(logits, targets) * 0.5
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


def test_losses_finite_and_nonnegative():
    logits, targets = _rand_logits_targets()
    for name in ["bce", "wbce", "mbce", "dice", "ce"]:
        val = float(get_loss_fn(name)(logits, targets))
        assert np.isfinite(val)
        assert val >= 0


def test_dice_perfect_prediction_near_zero():
    targets = jnp.asarray((np.random.RandomState(0).rand(1, 8, 8, 3) > 0.5)
                          .astype(np.float32))
    logits = (targets * 2 - 1) * 20.0  # saturating logits
    val = float(soft_dice_loss(logits, targets))
    assert val < 0.05


def test_fused_class_offset_loss_composition():
    logits, targets = _rand_logits_targets(shape=(2, 8, 8, 7))
    total, (cls, ofs) = fused_class_offset_loss(logits, targets, 3, alpha=2.0)
    ref_cls = bce_with_logits_loss(logits[..., :3], targets[..., :3])
    ref_ofs = bce_with_logits_loss(logits[..., 3:], targets[..., 3:])
    np.testing.assert_allclose(float(total),
                               float(ref_cls + 2.0 * ref_ofs), rtol=1e-6)


def test_running_score_perfect():
    rs = runningScore(3, ["bg", "a", "b"])
    target = np.zeros((1, 8, 8, 3), np.float32)
    target[..., 0] = 1
    target[0, 2:5, 2:5, :] = [0, 1, 0]
    rs.update(target, target)
    scores, class_iou = rs.get_scores()
    assert scores["overall_acc"] == 1.0
    assert class_iou["bg"] == 1.0 and class_iou["a"] == 1.0


def test_offset_iou():
    oi = offsetIoU([(1, 0), (0, 1)])
    gt = np.ones((1, 8, 8, 2), np.float32)
    gt[0, 0, :, 0] = 0  # one boundary row in offset 0
    pred = gt.copy()
    oi.update(pred, gt)
    iou, miou = oi.get_scores()
    assert iou[0] == 1.0
    assert np.isnan(iou[1])  # no boundary at all in offset 1
