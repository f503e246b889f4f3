"""Checkpointing: orbax-backed save/restore of the full train state plus the
offset list (the offset set is part of the model contract — it is persisted
in the checkpoint and reloaded at inference, reference
`train_utils.py:286-295`, `egs/cityscape/local/offset_infer.py:43`).

Also provides a torch `.pth.tar` importer so reference-trained weights can
be loaded for forward-parity checks (conv NCHW->HWIO transpose, BN
running-stats mapping).
"""

import json
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def _is_primary():
    return jax.process_index() == 0


def _sync(tag):
    """Cross-process barrier (no-op single-process): filesystem mutations
    around an orbax save/restore must not race the other hosts."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)


def save_checkpoint(dir, state, is_best, offsets=None, epoch=None,
                    best_iou=None, filename="checkpoint"):
    """Save train state (+ metadata) under `dir`/`filename`; copy to
    `dir`/model_best when `is_best` (reference train_utils.py:286-295).

    Multi-host safe: every process must call (orbax coordinates the
    sharded write); the surrounding directory mutations (rmtree of a
    stale checkpoint, metadata, the model_best copy) run on process 0
    only, fenced by global barriers."""
    ocp = _ocp()
    path = os.path.abspath(os.path.join(dir, filename))
    if _is_primary():
        os.makedirs(dir, exist_ok=True)
        if os.path.exists(path):
            shutil.rmtree(path)
    _sync("mergenet:ckpt:pre-save")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "step": int(state.step),
        })
    if _is_primary():
        meta = {"epoch": epoch, "best_iou": best_iou,
                "offsets": [list(o) for o in offsets] if offsets else None}
        with open(os.path.join(dir, filename + ".meta.json"), "w") as f:
            json.dump(meta, f)
        if is_best:
            best = os.path.abspath(os.path.join(dir, "model_best"))
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(path, best)
            shutil.copyfile(os.path.join(dir, filename + ".meta.json"),
                            os.path.join(dir, "model_best.meta.json"))
    _sync("mergenet:ckpt:post-save")


def load_checkpoint(dir, state, filename="checkpoint"):
    """Restore a checkpoint into `state`; returns (state, meta dict).

    `dir` may be either the experiment directory (the `filename` checkpoint
    inside it is loaded) or a direct path to a checkpoint directory such as
    `<exp>/model_best`.  meta contains 'epoch', 'best_iou', and 'offsets'.
    """
    ocp = _ocp()
    path = os.path.abspath(os.path.join(dir, filename))
    meta_path = os.path.join(dir, filename + ".meta.json")
    if not os.path.exists(path):
        # `dir` is itself a checkpoint directory
        path = os.path.abspath(dir)
        meta_path = path + ".meta.json"
    target = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
    }
    with ocp.StandardCheckpointer() as ckptr:
        try:
            restored = ckptr.restore(path, target)
            opt_state = restored["opt_state"]
        except (ValueError, TypeError):
            # optimizer tree mismatch (e.g. the checkpoint was trained with
            # an LR schedule but this state wasn't built with one) — restore
            # model state only and keep the fresh optimizer state
            # target-free restore returns the raw saved tree; take the
            # model subtrees and keep the fresh optimizer state
            restored = ckptr.restore(path)
            opt_state = state.opt_state
    state = state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"],
        opt_state=opt_state,
        step=jnp.asarray(restored["step"], jnp.int32))
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("offsets"):
            meta["offsets"] = [tuple(o) for o in meta["offsets"]]
    return state, meta


def import_torch_checkpoint(path):
    """Load a reference `.pth.tar` checkpoint into a flat dict of numpy
    arrays keyed by the torch state-dict names, with conv kernels transposed
    to HWIO.  Returns (flat_weights, metadata)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("model_state", ckpt)
    out = {}
    for k, v in state_dict.items():
        a = v.detach().cpu().numpy()
        if a.ndim == 4:  # conv OIHW -> HWIO
            a = np.transpose(a, (2, 3, 1, 0))
        out[k] = a
    meta = {k: ckpt[k] for k in ("epoch", "best_iou", "offset")
            if isinstance(ckpt, dict) and k in ckpt}
    return out, meta
