"""Export a trained PSPFPNet checkpoint + val images as committed
bench fixtures (VERDICT r3 #5): bench.py's fused e2e path then runs REAL
weights on REAL images and decodes the net's OWN outputs instead of
mixing a fixture scene into a random-weights forward.

Writes to tests/fixtures/certification512/:
    bench_ckpt.npz  — flattened param/batch_stats tree; params in f16
                      (bench casts to bf16 anyway), batch_stats in f32
    bench_img.png   — first val image (kept for fixture back-compat)
    bench_img_{k}.png — further val images, so the fused-e2e timing gets
                      the same across-image spread treatment as the
                      staged decode (e2e cost is data-dependent through
                      the decode stage; VERDICT r4 #5)

Usage:
    python scripts/export_bench_checkpoint.py /tmp/cert512 seed0 [n_imgs]
"""
import json
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIX = os.path.join(REPO, "tests", "fixtures", "certification512")

#: npz key separator for flattened tree paths (keys never contain it)
SEP = "|"


def flatten_tree(tree, prefix, out, cast16):
    for k, v in tree.items():
        key = prefix + SEP + k if prefix else k
        if isinstance(v, dict):
            flatten_tree(v, key, out, cast16)
        else:
            a = np.asarray(v)
            out[key] = a.astype(np.float16) if (cast16 and
                                                a.dtype == np.float32) \
                else a


def unflatten_tree(npz, prefix):
    tree = {}
    for key in npz.files:
        if not key.startswith(prefix + SEP):
            continue
        parts = key[len(prefix) + 1:].split(SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = npz[key]
    return tree


def load_bench_checkpoint(path):
    """(params, batch_stats) dicts from an exported bench_ckpt.npz."""
    npz = np.load(path)
    return unflatten_tree(npz, "p"), unflatten_tree(npz, "b")


def main():
    out_dir, seed = sys.argv[1], sys.argv[2]
    import jax
    from mergenet_tpu.models import get_model
    from mergenet_tpu.parallel import make_optimizer, create_train_state
    from mergenet_tpu.utils.checkpoint import load_checkpoint

    summary = json.load(open(os.path.join(out_dir, "summary.json")))
    C, O = (summary["config"]["num_classes"],
            summary["config"]["num_offsets"])
    model = get_model(C, O, "pspfpnet")
    tx = make_optimizer(lr=0.02)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               (1, 128, 128, 3))
    state, _ = load_checkpoint(os.path.join(out_dir, seed, "model_best"),
                               state)

    flat = {}
    flatten_tree(jax.tree_util.tree_map(np.asarray, state.params),
                 "p", flat, cast16=True)
    flatten_tree(jax.tree_util.tree_map(np.asarray, state.batch_stats),
                 "b", flat, cast16=False)
    np.savez_compressed(os.path.join(FIX, "bench_ckpt.npz"), **flat)

    # the first committed fixtures' val images, for the e2e inputs
    from mergenet_tpu.data.coco import COCO
    val_ann = os.path.join(out_dir, "data", "annotations",
                           "instancesonly_val.json")
    coco = COCO(val_ann)
    n_imgs = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    ids = sorted(coco.imgs.keys())[:n_imgs]
    for k, img_id in enumerate(ids):
        fname = coco.loadImgs(img_id)[0]["file_name"]
        dst = "bench_img.png" if k == 0 else "bench_img_%d.png" % k
        shutil.copy(os.path.join(out_dir, "data", "val", fname),
                    os.path.join(FIX, dst))
    sz = os.path.getsize(os.path.join(FIX, "bench_ckpt.npz"))
    print("wrote bench_ckpt.npz (%.1f MB) + %d val images (ids %s)"
          % (sz / 1e6, len(ids), ids))


if __name__ == "__main__":
    main()
