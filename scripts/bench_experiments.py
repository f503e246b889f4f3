#!/usr/bin/env python3
"""One-off TPU measurement harness for optimization candidates.

Run: python scripts/bench_experiments.py [exp ...]
Experiments (default: all):
  stem    — decompose the 6.6 ms stem: conv7x7 alone, maxpool alone,
            shift-max pool rewrite
  fusion  — FPN fusion conv variants: concat+conv vs per-level convs
  batch   — vmap-batched hierarchical decode throughput (frames 1/2/4)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    _sync(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    _sync(r)
    return (time.time() - t0) / iters * 1000


def _sync(r):
    import jax
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(leaf.reshape(-1)[0])


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    import jax.numpy as jnp
    import flax.linen as nn

    exps = sys.argv[1:] or ["stem", "fusion", "batch"]
    bf = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    rnd = np.random.RandomState(0)

    if "stem" in exps:
        H, W = 1024, 2048
        x = jnp.asarray(rnd.rand(1, H, W, 3).astype(np.float32)).astype(bf)
        stem = nn.Conv(64, (7, 7), strides=(2, 2),
                       padding=((3, 3), (3, 3)), use_bias=False, dtype=bf)
        v = stem.init(rng, x[:, :8, :8, :])
        y = jnp.asarray(rnd.rand(1, H // 2, W // 2, 64)
                        .astype(np.float32)).astype(bf)

        @jax.jit
        def conv_only(v, x):
            return jnp.sum(stem.apply(v, x).astype(jnp.float32))

        from mergenet_tpu.models.layers import max_pool

        @jax.jit
        def pool_only(y):
            return jnp.sum(max_pool(y, window=3, stride=2,
                                    padding=((1, 1), (1, 1)))
                           .astype(jnp.float32))

        @jax.jit
        def pool_shift(y):
            # 3x3/s2 maxpool as 9 shifted strided slices + max (VPU)
            yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                         constant_values=-np.inf)
            h2, w2 = y.shape[1] // 2, y.shape[2] // 2
            out = None
            for di in range(3):
                for dj in range(3):
                    s = yp[:, di:di + 2 * h2:2, dj:dj + 2 * w2:2, :]
                    out = s if out is None else jnp.maximum(out, s)
            return jnp.sum(out.astype(jnp.float32))

        # f32 input conv (is bf16 the problem?)
        stem32 = nn.Conv(64, (7, 7), strides=(2, 2),
                         padding=((3, 3), (3, 3)), use_bias=False)
        v32 = stem32.init(rng, x[:, :8, :8, :].astype(jnp.float32))
        x32 = x.astype(jnp.float32)

        @jax.jit
        def conv_only32(v, x):
            return jnp.sum(stem32.apply(v, x))

        print("stem conv7x7/2 bf16 alone:   %.2f ms" % timeit(conv_only, v, x))
        print("stem conv7x7/2 f32 alone:    %.2f ms"
              % timeit(conv_only32, v32, x32))
        print("maxpool 3x3/2 reduce_window: %.2f ms" % timeit(pool_only, y))
        print("maxpool 3x3/2 shift-max:     %.2f ms" % timeit(pool_shift, y))

    if "fusion" in exps:
        Hq, Wq = 256, 512
        feats = [jnp.asarray(rnd.rand(1, Hq, Wq, 256).astype(np.float32))
                 .astype(bf) for _ in range(4)]
        fuse = nn.Conv(256, (3, 3), padding="SAME", dtype=bf)
        xcat = jnp.concatenate(feats, axis=-1)
        fv = fuse.init(rng, xcat)

        @jax.jit
        def concat_conv(v, feats):
            return jnp.sum(fuse.apply(v, jnp.concatenate(feats, axis=-1))
                           .astype(jnp.float32))

        @jax.jit
        def split_conv(v, feats):
            k = v["params"]["kernel"]          # (3,3,1024,256)
            b = v["params"]["bias"]
            out = None
            for i, f in enumerate(feats):
                ki = k[:, :, 256 * i:256 * (i + 1), :].astype(bf)
                y = jax.lax.conv_general_dilated(
                    f, ki, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                out = y if out is None else out + y
            return jnp.sum((out + b.astype(bf)).astype(jnp.float32))

        print("fusion concat->conv3x3 1024->256: %.2f ms"
              % timeit(concat_conv, fv, feats))
        print("fusion 4x split conv3x3 256->256: %.2f ms"
              % timeit(split_conv, fv, feats))

    if "batch" in exps:
        import os
        from mergenet_tpu.decoder.device import (decode_hierarchical,
                                                 relabel_mask)
        fix = os.path.join("tests", "fixtures", "certification512")
        d = np.load(os.path.join(fix, "probs_0.npz"))
        offsets = tuple(tuple(int(v) for v in o)
                        for o in np.load(os.path.join(fix, "offsets.npy")))
        cp = jnp.asarray(d["cp"].astype(np.float32))
        sp = jnp.asarray(d["sp"].astype(np.float32))
        C = cp.shape[-1]

        def one(cp, sp):
            label, root_class, is_inst = decode_hierarchical(
                cp, sp, C, offsets, object_merge_factor=1.0,
                merge_logprob_bias=0.03)
            mask, inst_class = relabel_mask(label, root_class, is_inst)
            return jnp.sum(mask) + jnp.max(inst_class)

        single = jax.jit(one)
        print("decode batch=1: %.2f ms/frame" % timeit(single, cp, sp,
                                                       iters=6))
        for B in (2, 4):
            cpb = jnp.stack([cp] * B)
            spb = jnp.stack([sp] * B)
            batched = jax.jit(jax.vmap(one))
            ms = timeit(batched, cpb, spb, iters=4)
            print("decode batch=%d (vmap): %.2f ms total, %.2f ms/frame"
                  % (B, ms, ms / B))


if __name__ == "__main__":
    main()
