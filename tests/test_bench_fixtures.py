"""Committed bench checkpoint fixtures (VERDICT r3 #5): bench.py's
fused-e2e stage runs REAL trained weights on a REAL val image and
decodes the net's own outputs.  This test pins the fixture contract so
a param-tree rename or a broken export trips in-suite instead of
silently downgrading the bench to random weights."""

import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures",
                   "certification512")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIX, "bench_ckpt.npz")),
    reason="bench checkpoint not exported yet "
           "(scripts/export_bench_checkpoint.py)")


def test_bench_checkpoint_matches_model_tree():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import load_bench_checkpoint
    import jax
    from mergenet_tpu.models import get_model, init_model

    params, batch_stats = load_bench_checkpoint(
        os.path.join(FIX, "bench_ckpt.npz"))
    d = np.load(os.path.join(FIX, "probs_%d.npz"
                             % sorted(int(f.split("_")[1].split(".")[0])
                                      for f in os.listdir(FIX)
                                      if f.startswith("probs_"))[0]))
    C = d["cp"].shape[-1]
    O = d["sp"].shape[-1]
    model = get_model(C, O, "pspfpnet")
    ref_p, ref_b = init_model(model, jax.random.PRNGKey(0),
                              (1, 64, 64, 3))

    def paths(tree, prefix=()):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= paths(v, prefix + (k,))
            else:
                out.add(prefix + (k,))
        return out

    assert paths(params) == paths(ref_p)
    assert paths(batch_stats) == paths(ref_b)
    # every leaf shape matches the model's
    flat_ck = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_rf = dict(jax.tree_util.tree_flatten_with_path(ref_p)[0])
    for k, v in flat_rf.items():
        assert np.asarray(flat_ck[k]).shape == np.asarray(v).shape, k


def test_bench_image_exists_and_decodes_size():
    import cv2
    img = cv2.imread(os.path.join(FIX, "bench_img.png"))
    assert img is not None
    assert img.shape[:2] == (512, 1024)
