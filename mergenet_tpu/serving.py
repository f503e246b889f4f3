"""Multi-chip serving: sharded end-to-end net + merge decode.

Frames are embarrassingly parallel across chips, so the serving pipeline
shards the batch over the mesh's 'data' axis with `shard_map`: each
device runs the full single-chip path (net forward -> certified
`decode_hierarchical` -> relabel) over its local shard via `lax.map` —
no collectives on the serving path at all; the only communication is the
output gather `jit` inserts when the caller reads the result.

This is the TPU-native replacement for the reference's multi-process
`--job/--num-jobs` image sharding (`utils/dataset.py:56-63`): one SPMD
program instead of N processes, and the decode never leaves the device.

Overflow fallback (VERDICT r3 #2): `decode_hierarchical`'s capacities
are budgets sized for the certified workload; an over-budget scene
drops edges/pairs or freezes components (counted by `return_stats`)
and silently under-merges.  The serial greedy never drops a merge
(reference `segment.cc:520-573`), so with `overflow_fallback=True` the
pipeline carries a per-frame overflow counter out of the jitted decode
and the host wrapper re-decodes only the flagged frames with the exact
mode (`run_segmentation_device`, measured overflow-proof capacities).
The fast path stays one SPMD dispatch; the fallback costs one extra
dispatch per over-budget frame (~6.6 s vs ~43 ms — rare by
construction, certified zero-overflow on the validation set; the
annealed exact fallback measures +1.5 AP over the C++ greedy,
docs/decoder.md).

Throughput: see bench.py / the driver's newest
BENCH_rNN.json (22.01 fps/chip as of round 5, BENCH_LOCAL.json —
`scripts/check_docs_numbers.py` keeps this number honest); per-chip
decode is independent, so a
v5e-8 slice serves ~8x that (validated for compile+execution on a
virtual 8-device mesh by tests/test_serving.py — including a
flagship-shape PSPFPNet parity test — and the driver's
`dryrun_multichip`).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .decoder.device import decode_hierarchical, run_segmentation_device
from .models import logits_at, probs_at


def build_serving_pipeline(model, num_classes, offsets, mesh,
                           decode_size=None, dtype=None,
                           same_different_bias=0.0,
                           object_merge_factor=1.0,
                           merge_logprob_bias=0.03, hier_kwargs=None,
                           overflow_fallback=False):
    """Returns serve(variables, imgs) -> (masks, inst_classes).

    imgs: (B, H, W, 3) float32 with B divisible by the 'data' axis size.
    Masks come back at full resolution ((B, H, W) int32, ids 1..K per
    image); inst_classes maps ids to classes (padded with -1).

    With `overflow_fallback=True` the return gains a third element —
    the per-frame overflow counts (B,) int32 (edges + pairs dropped +
    frozen components; 0 = certified-exact budget semantics) — and any
    frame with a nonzero count is transparently re-decoded on host via
    the exact mode, so served masks never silently under-merge.
    """
    offsets = tuple(tuple(o) for o in offsets)
    hyper = dict(same_different_bias=same_different_bias,
                 object_merge_factor=object_merge_factor,
                 merge_logprob_bias=merge_logprob_bias)

    def probs_small(variables, img, dh, dw):
        x = img[None]
        if dtype is not None:
            x = x.astype(dtype)
        return probs_at(model, variables, x, (dh, dw))[0]

    def one(variables, img):
        H, W = img.shape[0], img.shape[1]
        dh, dw = decode_size if decode_size else (H // 2, W // 2)
        x = img[None]
        if dtype is not None:
            x = x.astype(dtype)
        # fast path: raw logits into the decode's collapsed log-domain
        # (skips the per-frame sigmoid -> log round trip); models
        # without output_size fall back to probs_at
        raw = logits_at(model, variables, x, (dh, dw))
        small = raw[0] if raw is not None \
            else probs_small(variables, img, dh, dw)
        out = decode_hierarchical(
            small[..., :num_classes], small[..., num_classes:],
            num_classes, offsets, relabel=True,
            return_stats=overflow_fallback,
            from_logits=raw is not None,
            **hyper, **(hier_kwargs or {}))
        if overflow_fallback:
            mask, inst_class, stats = out
            overflow = (stats["edges_dropped"] + stats["pairs_dropped"]
                        + stats["n_frozen"])
        else:
            mask, inst_class = out
            overflow = jnp.int32(0)
        full = jax.image.resize(mask.astype(jnp.int32), (H, W), "nearest")
        return full, inst_class, overflow

    def local_shard(variables, imgs):
        # per-device: independent per-image decode, one dispatch
        return jax.lax.map(partial(one, variables), imgs)

    sharded = jax.shard_map(
        local_shard, mesh=mesh,
        in_specs=(P(), P("data")), out_specs=P("data"),
        check_vma=False)
    fast = jax.jit(sharded)

    if not overflow_fallback:
        def serve(variables, imgs):
            masks, inst_classes, _ = fast(variables, imgs)
            return masks, inst_classes
        return serve

    probs_jit = jax.jit(probs_small, static_argnums=(2, 3))

    def serve(variables, imgs):
        masks, inst_classes, overflow = fast(variables, imgs)
        counts = np.asarray(overflow)
        if not counts.any():
            return masks, inst_classes, overflow
        masks = np.array(masks)            # writable host copies
        inst_classes = np.array(inst_classes)
        H, W = imgs.shape[1], imgs.shape[2]
        dh, dw = decode_size if decode_size else (H // 2, W // 2)
        for b in np.nonzero(counts)[0]:
            small = np.asarray(probs_jit(variables, imgs[b], dh, dw),
                               np.float32)
            # exact mode: measured overflow-proof capacities — the
            # documented fallback contract (decoder/device.py)
            mask, classes = run_segmentation_device(
                np.moveaxis(small[..., :num_classes], -1, 0),
                np.moveaxis(small[..., num_classes:], -1, 0),
                num_classes, offsets, mode="exact", **hyper)
            full = jax.image.resize(jnp.asarray(mask, jnp.int32), (H, W),
                                    "nearest")
            masks[b] = np.asarray(full)
            row = np.full((inst_classes.shape[1],), -1, np.int32)
            row[:len(classes)] = classes
            inst_classes[b] = row
        return masks, inst_classes, overflow

    return serve
