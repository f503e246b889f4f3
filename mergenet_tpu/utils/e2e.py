"""In-memory end-to-end inference: net forward + on-device merge decode in
one jitted program, no per-image host sync or npy filesystem handoff.

The staged recipe (class_infer -> offset_infer -> segment) keeps the
reference's filesystem contract; this is the production fast path the
BASELINE.json north star asks for ("net-forward + merge runs without
per-image host sync").  One dispatch per batch; only the compact instance
masks return to the host.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..decoder.device import (decode_on_device, decode_on_device_staged,
                              decode_hierarchical, relabel_mask)
from ..models import logits_at, probs_at


def build_e2e_infer(model, num_classes, offsets, decode_size=None,
                    same_different_bias=0.0, object_merge_factor=1.0,
                    merge_logprob_bias=0.03, max_rounds=48,
                    max_components=None, max_edges=None, dtype=None,
                    decode_mode="hier", hier_kwargs=None):
    """Returns infer(variables, imgs) -> (masks, inst_classes).

    imgs: (N, H, W, 3) float32.  The net runs at full resolution; decode
    happens at `decode_size` (h, w) (default: half resolution, the
    reference's choice) and the mask is upsampled back with
    nearest-neighbor, exactly like `segment.py:146-149`.

    decode_mode: 'hier' (default — `decode_hierarchical`, the certified
    serving configuration; override its capacities via `hier_kwargs`),
    'exact' (staged two-pass aggregated Boruvka — the quality oracle), or
    capped single-pass via `max_components`/`max_edges`.
    """
    offsets = tuple(tuple(o) for o in offsets)

    def one(variables, img):
        H, W = img.shape[0], img.shape[1]
        dh, dw = decode_size if decode_size else (H // 2, W // 2)
        x = img[None]
        if dtype is not None:
            x = x.astype(dtype)
        # hier fast path: raw logits into the decode's collapsed
        # log-domain (skips the sigmoid -> log round trip over C+O
        # planes); models without output_size fall back to probs_at
        raw = logits_at(model, variables, x, (dh, dw)) \
            if decode_mode == "hier" else None
        small = raw[0] if raw is not None \
            else probs_at(model, variables, x, (dh, dw))[0]
        cp = small[..., :num_classes]
        sp = small[..., num_classes:]
        kw = dict(same_different_bias=same_different_bias,
                  object_merge_factor=object_merge_factor,
                  merge_logprob_bias=merge_logprob_bias)
        if decode_mode == "hier":
            # relabel=True fuses the instance relabel into the decode's
            # final gather (one N-sized gather saved per frame)
            mask, inst_class = decode_hierarchical(
                cp, sp, num_classes, offsets, relabel=True,
                from_logits=raw is not None, **kw,
                **(hier_kwargs or {}))
        elif max_components is None and max_edges is None:
            label, root_class, is_inst = decode_on_device_staged(
                cp, sp, num_classes, offsets, max_rounds=max_rounds, **kw)
        else:
            label, root_class, is_inst = decode_on_device(
                cp, sp, num_classes, offsets, max_components=max_components,
                max_edges=max_edges, max_rounds=max_rounds, **kw)
        if decode_mode != "hier":
            mask, inst_class = relabel_mask(label, root_class, is_inst)
        # nearest-neighbor upsample back to full resolution
        full = jax.image.resize(mask.astype(jnp.int32), (H, W),
                                "nearest")
        return full, inst_class

    @jax.jit
    def infer(variables, imgs):
        # lax.map, not vmap: a vmapped while_loop couples decode
        # convergence across the batch (every image pays the slowest
        # image's rounds times batch width); lax.map runs each image
        # independently in one dispatch
        return jax.lax.map(lambda im: one(variables, im), imgs)

    return infer


def masks_to_results(masks, inst_classes, image_ids, catIds):
    """Convert a decoded batch into COCO result dicts (host side)."""
    from ..data import rle as maskUtils
    masks = np.asarray(masks)
    inst_classes = np.asarray(inst_classes)
    out = []
    for b in range(masks.shape[0]):
        mask = masks[b]
        for i in range(1, int(mask.max()) + 1):
            cls = int(inst_classes[b][i - 1])
            if cls < 0:
                continue
            m = (mask == i).astype(np.uint8)
            out.append({
                "image_id": int(image_ids[b]),
                "score": 1,
                "category_id": catIds[cls],
                "segmentation": maskUtils.encode(np.asfortranarray(m)),
            })
    return out
