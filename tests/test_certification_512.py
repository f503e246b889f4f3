"""Native-512x1024 decoder certification (VERDICT r2 #2).

Fixtures (tests/fixtures/certification512/) are NATIVE 512x1024
class/sameness probability maps from a PSPFPNet-r50 trained on the
synthetic street set at the reference decode size (`segment.py:93` —
no upscaling anywhere), plus the C++ greedy oracle's masks for the same
inputs, the GT annotations, and `summary.json` with the full-val-set
(50 images) multi-seed APs recorded by
`scripts/make_certification_fixtures.py`.

The gate: `decode_hierarchical` DEFAULTS (the bench.py serving config)
reach mask-AP parity with the serial C++ greedy on the committed fixture
subset, with zero capacity overflows.  The statistically solid claim
lives in summary.json (mean over seeds on n=50); this test pins the
committed evidence so any decoder regression trips in-suite.
"""

import io
import contextlib
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from mergenet_tpu.decoder.device import decode_hierarchical, relabel_mask
from mergenet_tpu.data import rle as maskUtils
from mergenet_tpu.data.coco import COCO
from mergenet_tpu.data.cocoeval import COCOeval

FIX = os.path.join(os.path.dirname(__file__), "fixtures",
                   "certification512")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIX, "val_ann.json")),
    reason="native-512x1024 certification fixtures not generated yet")


def _fixture_ids():
    return sorted(int(f.split("_")[1].split(".")[0])
                  for f in os.listdir(FIX) if f.startswith("probs_"))


def _mask_to_results(mask, classes, img_id):
    out = []
    for i, cls in enumerate(classes, start=1):
        m = (mask == i).astype(np.uint8)
        if m.sum():
            out.append({"image_id": img_id, "score": 1.0,
                        "category_id": int(cls), "area": int(m.sum()),
                        "segmentation": maskUtils.encode(
                            np.asfortranarray(m))})
    return out


def _ap(coco, results):
    E = COCOeval(coco, coco.loadRes(results), "segm")
    E.evaluate()
    E.accumulate()
    with contextlib.redirect_stdout(io.StringIO()):
        E.summarize()
    return float(E.stats[0]), float(E.stats[1])


def test_native_512x1024_hier_ap_parity_with_cpp_greedy():
    coco = COCO(os.path.join(FIX, "val_ann.json"))
    offsets = tuple(tuple(int(x) for x in o)
                    for o in np.load(os.path.join(FIX, "offsets.npy")))
    ids = _fixture_ids()[:4]  # 4 in the default suite; all 8 slow below
    res_hier, res_cpp = [], []
    for i in ids:
        d = np.load(os.path.join(FIX, "probs_%d.npz" % i))
        cp = jnp.asarray(d["cp"].astype(np.float32))
        sp = jnp.asarray(d["sp"].astype(np.float32))
        assert cp.shape[:2] == (512, 1024)  # NATIVE reference decode size
        comp, rc, ii, st = decode_hierarchical(
            cp, sp, cp.shape[-1], offsets, object_merge_factor=1.0,
            merge_logprob_bias=0.03, return_stats=True)
        # zero capacity overflow on certified trained outputs
        assert int(st["edges_dropped"]) == 0
        assert int(st["pairs_dropped"]) == 0
        assert int(st["n_frozen"]) == 0
        mask, ic = relabel_mask(comp, rc, ii)
        classes = [int(c) for c in np.asarray(ic) if c >= 0]
        res_hier += _mask_to_results(np.asarray(mask), classes, i)

        cm = np.load(os.path.join(FIX, "cpp_mask_%d.npz" % i))
        res_cpp += _mask_to_results(cm["mask"].astype(np.int32),
                                    [int(c) for c in cm["classes"]], i)

    ap_h, ap50_h = _ap(coco, res_hier)
    ap_c, ap50_c = _ap(coco, res_cpp)
    # parity gate: within 1 AP point of the greedy oracle (measured ahead
    # on the full val set — see summary.json / docs/benchmarks.md)
    assert ap_h >= ap_c - 0.01, (ap_h, ap_c)
    assert ap50_h >= ap50_c - 0.03, (ap50_h, ap50_c)


@pytest.mark.slow
def test_native_512x1024_all_fixtures():
    """Same gate over every committed fixture image."""
    coco = COCO(os.path.join(FIX, "val_ann.json"))
    offsets = tuple(tuple(int(x) for x in o)
                    for o in np.load(os.path.join(FIX, "offsets.npy")))
    res_hier, res_cpp = [], []
    for i in _fixture_ids():
        d = np.load(os.path.join(FIX, "probs_%d.npz" % i))
        comp, rc, ii = decode_hierarchical(
            jnp.asarray(d["cp"].astype(np.float32)),
            jnp.asarray(d["sp"].astype(np.float32)),
            d["cp"].shape[-1], offsets, object_merge_factor=1.0,
            merge_logprob_bias=0.03)
        mask, ic = relabel_mask(comp, rc, ii)
        classes = [int(c) for c in np.asarray(ic) if c >= 0]
        res_hier += _mask_to_results(np.asarray(mask), classes, i)
        cm = np.load(os.path.join(FIX, "cpp_mask_%d.npz" % i))
        res_cpp += _mask_to_results(cm["mask"].astype(np.int32),
                                    [int(c) for c in cm["classes"]], i)
    ap_h, _ = _ap(coco, res_hier)
    ap_c, _ = _ap(coco, res_cpp)
    assert ap_h >= ap_c - 0.01, (ap_h, ap_c)


def test_summary_multiseed_gate():
    """The recorded full-val-set evidence: on every seed, hier AND the
    annealed exact mode are within 1 AP point of the C++ greedy, and the
    MEAN delta over seeds is non-negative before claiming 'ahead'
    anywhere.  The exact gate certifies the round-4 anneal fix
    (run_segmentation_device defaults anneal_start=8.0/halvings=8) on
    every seed, not just the seed-0 re-sweep (VERDICT r4 #2)."""
    with open(os.path.join(FIX, "summary.json")) as f:
        summary = json.load(f)
    if any("hier" not in e or "cpp" not in e
           for e in summary["seeds"].values()):
        pytest.skip("summary.json was regenerated with --skip-cpp/"
                    "--skip-exact; the multi-seed gate needs both "
                    "decoders (rerun make_certification_fixtures.py "
                    "without skip flags)")
    deltas, exact_deltas = [], []
    for seed, entry in summary["seeds"].items():
        assert entry["overflow"]["edges_dropped"] == 0, seed
        assert entry["overflow"]["pairs_dropped"] == 0, seed
        assert entry["hier"]["AP"] >= entry["cpp"]["AP"] - 0.01, (
            seed, entry)
        deltas.append(entry["hier"]["AP"] - entry["cpp"]["AP"])
        if "exact" in entry:
            assert entry["exact"]["AP"] >= entry["cpp"]["AP"] - 0.01, (
                seed, entry)
            exact_deltas.append(entry["exact"]["AP"] - entry["cpp"]["AP"])
    assert len(deltas) >= 3  # multi-seed evidence
    assert len(exact_deltas) >= 3  # annealed exact certified per seed
    # docs state "parity, measured ahead" — the mean must back that
    assert float(np.mean(deltas)) >= 0.0, deltas
