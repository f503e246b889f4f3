"""Tests for the merge decoders: oracle decode, bookkeeping invariants, and
Python <-> C++ parity on identical inputs."""

import numpy as np
import pytest

from mergenet_tpu.decoder import ObjectSegmenter, SegmenterOptions
from mergenet_tpu.decoder import csegment

from helpers import (make_instance_scene, oracle_probs,
                     matches_ground_truth, instances_equivalent)

OFFSETS = [(1, 0), (0, 1), (-2, -1), (1, -2), (3, 2)]
NUM_CLASSES = 3


@pytest.fixture(scope="module")
def oracle_inputs():
    inst, classes = make_instance_scene()
    cp, sp = oracle_probs(inst, classes, NUM_CLASSES, OFFSETS)
    return inst, classes, cp, sp


@pytest.mark.parametrize("den_mode,remerge", [("sum", "eq"),
                                              ("product", "ge")])
def test_oracle_decode_python(oracle_inputs, den_mode, remerge):
    inst, classes, cp, sp = oracle_inputs
    opts = SegmenterOptions(object_merge_factor=1.0 / len(OFFSETS),
                            den_mode=den_mode, remerge_mode=remerge,
                            do_prune=False)
    seg = ObjectSegmenter(cp, sp, NUM_CLASSES, OFFSETS, opts)
    mask, object_class = seg.run_segmentation()
    assert matches_ground_truth(mask, object_class, inst, classes)


def test_total_logprob_bookkeeping(oracle_inputs):
    """Incrementally-maintained objective == recomputed-from-scratch, both
    before and after the greedy run (reference segmenter.py:312-349)."""
    _, _, cp, sp = oracle_inputs
    opts = SegmenterOptions(object_merge_factor=0.2, do_prune=False)
    seg = ObjectSegmenter(cp, sp, NUM_CLASSES, OFFSETS, opts)
    a = seg.compute_total_logprob()
    b = seg.compute_total_logprob_from_scratch()
    assert abs(a - b) < 1e-6 * max(1.0, abs(a))
    before = a
    seg.run_segmentation()
    a = seg.compute_total_logprob()
    b = seg.compute_total_logprob_from_scratch()
    assert abs(a - b) < 1e-6 * max(1.0, abs(a))
    # greedy only does non-negative-gain merges, so objective cannot drop
    # (up to the priority bias term which is 0 here)
    assert a >= before - 1e-6
    seg.debug()


def test_oracle_decode_cpp(oracle_inputs):
    inst, classes, cp, sp = oracle_inputs
    mask, object_class = csegment.run_segmentation(
        cp, sp, NUM_CLASSES, OFFSETS,
        object_merge_factor=1.0 / len(OFFSETS), do_prune=False)
    assert matches_ground_truth(mask, object_class, inst, classes)


@pytest.mark.parametrize("den_mode,remerge", [("sum", "eq"),
                                              ("product", "ge")])
def test_python_cpp_parity_random(den_mode, remerge):
    """Python and C++ decoders produce identical instance decompositions on
    noisy random inputs (both implement the same greedy schedule)."""
    rng = np.random.RandomState(42)
    H, W = 12, 16
    inst, classes = make_instance_scene(H, W)
    inst = inst[:H, :W]
    cp, sp = oracle_probs(inst, classes, NUM_CLASSES, OFFSETS, conf=0.8)
    # add noise so the decode is non-trivial
    cp = np.clip(cp + rng.uniform(-0.15, 0.15, cp.shape), 1e-4, 1 - 1e-4)
    sp = np.clip(sp + rng.uniform(-0.15, 0.15, sp.shape), 1e-4, 1 - 1e-4)
    cp = cp.astype(np.float32)
    sp = sp.astype(np.float32)

    opts = SegmenterOptions(object_merge_factor=0.2, merge_logprob_bias=0.01,
                            den_mode=den_mode, remerge_mode=remerge,
                            do_prune=False)
    seg = ObjectSegmenter(cp, sp, NUM_CLASSES, OFFSETS, opts)
    mask_py, cls_py = seg.run_segmentation()
    mask_cc, cls_cc = csegment.run_segmentation(
        cp, sp, NUM_CLASSES, OFFSETS, object_merge_factor=0.2,
        merge_logprob_bias=0.01, den_mode=den_mode, remerge_mode=remerge,
        do_prune=False)
    assert instances_equivalent(mask_py, cls_py, mask_cc, cls_cc)


def test_python_cpp_parity_aliased_deltas():
    """Distinct valid offsets can flatten to the same |di*W + dj| at
    small widths (W=64: (0,30) vs (1,-34) both give |delta| 30).  The
    C++ decoder's implicit-slot lookup must check every aliased offset's
    slot, not stop at the first dead one — a missed live record would
    split a pair's evidence across duplicate records and diverge from
    the Python greedy."""
    W = 64
    offsets = [(0, 30), (1, -34), (1, 0), (0, 1)]
    assert 0 * W + 30 == 1 * W - 34  # the alias under test (both +30)
    rng = np.random.RandomState(3)
    inst, classes = make_instance_scene(40, W)
    cp, sp = oracle_probs(inst, classes, NUM_CLASSES, offsets, conf=0.8)
    cp = np.clip(cp + rng.uniform(-0.2, 0.2, cp.shape),
                 1e-4, 1 - 1e-4).astype(np.float32)
    sp = np.clip(sp + rng.uniform(-0.2, 0.2, sp.shape),
                 1e-4, 1 - 1e-4).astype(np.float32)
    opts = SegmenterOptions(object_merge_factor=0.25,
                            merge_logprob_bias=0.01, den_mode="sum",
                            remerge_mode="eq", do_prune=False)
    seg = ObjectSegmenter(cp, sp, NUM_CLASSES, offsets, opts)
    mask_py, cls_py = seg.run_segmentation()
    mask_cc, cls_cc = csegment.run_segmentation(
        cp, sp, NUM_CLASSES, offsets, object_merge_factor=0.25,
        merge_logprob_bias=0.01, den_mode="sum", remerge_mode="eq",
        do_prune=False)
    assert instances_equivalent(mask_py, cls_py, mask_cc, cls_cc)


def test_cpp_batch(oracle_inputs):
    inst, classes, cp, sp = oracle_inputs
    B = 3
    cps = np.stack([cp] * B)
    sps = np.stack([sp] * B)
    masks, all_cls = csegment.run_segmentation_batch(
        cps, sps, NUM_CLASSES, OFFSETS,
        object_merge_factor=1.0 / len(OFFSETS), do_prune=False)
    for b in range(B):
        assert matches_ground_truth(masks[b], all_cls[b], inst, classes)


def test_prune_absorbs_weak_objects():
    """With a huge prune threshold every object falls into background."""
    inst, classes = make_instance_scene()
    cp, sp = oracle_probs(inst, classes, NUM_CLASSES, OFFSETS)
    opts = SegmenterOptions(object_merge_factor=0.2, do_prune=True,
                            prune_threshold=1e9)
    seg = ObjectSegmenter(cp, sp, NUM_CLASSES, OFFSETS, opts)
    mask, object_class = seg.run_segmentation()
    assert mask.max() == 0
    assert object_class == []


def test_same_different_bias_shifts_decisions():
    """A large negative bias makes everything 'different' (no merges of
    distinct pixels beyond class pressure); a large positive bias merges
    everything into one object."""
    inst, classes = make_instance_scene()
    cp, sp = oracle_probs(inst, classes, NUM_CLASSES, OFFSETS)
    opts_pos = SegmenterOptions(same_different_bias=50.0,
                                object_merge_factor=10.0, do_prune=False)
    seg = ObjectSegmenter(cp, sp, NUM_CLASSES, OFFSETS, opts_pos)
    mask, object_class = seg.run_segmentation()
    # everything merged into a single object (class may be anything)
    assert len(object_class) <= 1
