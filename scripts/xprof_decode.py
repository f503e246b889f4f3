#!/usr/bin/env python3
"""Trace the full certified decode (8 iterations) with jax.profiler and
print per-HLO-op self times (xprof hlo_stats), aggregated by category and
by op, so perf work targets the ops that actually dominate.

Usage: python scripts/xprof_decode.py [--e2e | --net] [--top N]
"""

import argparse
import csv
import glob
import io
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")


def trace_and_stats(fn, *args, iters=8):
    import jax
    logdir = tempfile.mkdtemp(prefix="xprof_")
    for _ in range(2):
        r = fn(*args)
    float(r)
    print("warmup done; tracing...", file=sys.stderr, flush=True)
    jax.profiler.start_trace(logdir)
    for _ in range(iters):
        r = fn(*args)
    float(r)
    jax.profiler.stop_trace()
    print("trace stopped; converting...", file=sys.stderr, flush=True)
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, "no xplane under " + logdir
    print("xplane bytes:", [os.path.getsize(p) for p in paths],
          file=sys.stderr, flush=True)
    try:
        from xprof.convert import raw_to_tool_data
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    return data


def summarize(csv_text, top, iters=8):
    if csv_text.lstrip().startswith("{"):
        # gviz JSON table (xprof >= 2.x returns this for hlo_stats)
        import json
        d = json.loads(csv_text, strict=False)
        cols = [c["id"] for c in d["cols"]]
        rows = [{cols[i]: (c or {}).get("v") for i, c in enumerate(r["c"])}
                for r in d["rows"]]
        rows = [{"HLO name": r.get("hlo_op_expression") or
                 r.get("hlo_op_name"),
                 "HLO category": r.get("category"),
                 "Occurrences": r.get("occurrences"),
                 "Total time (us)": r.get("total_self_time"),
                 "bound": r.get("bound_by")} for r in rows]
    else:
        rows = list(csv.DictReader(io.StringIO(csv_text)))
    if not rows:
        print(csv_text[:2000])
        return
    tf = None
    for cand in ("Total time (us)", "total_time_us", "Avg. time (us)"):
        if cand in rows[0]:
            tf = cand
            break
    if tf is None:
        print("columns:", list(rows[0].keys()))
        return
    name_f = ("HLO name" if "HLO name" in rows[0] else
              "hlo_op_name" if "hlo_op_name" in rows[0] else
              list(rows[0].keys())[0])
    cat_f = ("HLO category" if "HLO category" in rows[0] else
             "hlo_category" if "hlo_category" in rows[0] else None)
    occ_f = "Occurrences" if "Occurrences" in rows[0] else None

    def t(r):
        try:
            return float(r[tf])
        except Exception:
            return 0.0

    total = sum(t(r) for r in rows)
    print("total device us over {} iters: {:.0f}  ({:.2f} ms/iter)"
          .format(iters, total, total / iters / 1000))
    if cat_f:
        bycat = {}
        for r in rows:
            bycat[r[cat_f]] = bycat.get(r[cat_f], 0.0) + t(r)
        print("\n-- by category (ms/iter) --")
        for k, v in sorted(bycat.items(), key=lambda kv: -kv[1]):
            print("  %-34s %8.3f" % (k[:34], v / iters / 1000))
    print("\n-- top ops (ms/iter) --")
    for r in sorted(rows, key=t, reverse=True)[:top]:
        occ = r.get(occ_f, "?") if occ_f else "?"
        print("  %8.3f  x%-4s %-16s %s" % (
            t(r) / iters / 1000, occ,
            (r.get(cat_f, "") or "")[:16], r[name_f][:90]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--e2e", action="store_true")
    ap.add_argument("--net", action="store_true")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    import jax.numpy as jnp
    from bench import _fixture_scenes
    from mergenet_tpu.decoder.device import decode_hierarchical

    scenes, offsets = _fixture_scenes()
    num_classes = scenes[0][0].shape[-1]
    cp = jnp.asarray(scenes[0][0])
    sp = jnp.asarray(scenes[0][1])

    if args.net:
        from mergenet_tpu.models import get_model
        from bench import _bench_checkpoint
        params, batch_stats, imgs = _bench_checkpoint()
        img = imgs[0]
        model = get_model(num_classes, 10, "pspfpnet")
        variables = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.bfloat16)
            if np.issubdtype(np.asarray(a).dtype, np.floating) else
            jnp.asarray(a), {"params": params, "batch_stats": batch_stats})
        import cv2
        x = jnp.asarray(cv2.resize(img, (2048, 1024)).astype(np.float32)
                        [None] / 256.0)

        @jax.jit
        def fn(v, x):
            logits = model.apply(v, x.astype(jnp.bfloat16), train=False,
                                 output_size=(512, 1024))
            return jnp.sum(jax.nn.sigmoid(logits.astype(jnp.float32)))

        csv_text = trace_and_stats(fn, variables, x)
    else:
        @jax.jit
        def fn(cp, sp):
            mask, inst_class = decode_hierarchical(
                cp, sp, num_classes, offsets, object_merge_factor=1.0,
                merge_logprob_bias=0.03, relabel=True)
            return jnp.sum(mask) + jnp.max(inst_class)

        csv_text = trace_and_stats(fn, cp, sp)
    summarize(csv_text, args.top)


if __name__ == "__main__":
    main()
