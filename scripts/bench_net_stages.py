#!/usr/bin/env python3
"""Net-forward stage microbenchmark on the attached TPU.

Times the bench.py net workload (PSPFPNet-r50 bf16, 1024x2048 input,
output_size 512x1024) and its pieces — backbone, PPM, FPN, resizes — to
steer optimization of the 19 ms forward.

Usage: python scripts/bench_net_stages.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    float(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    float(r)
    return (time.time() - t0) / iters * 1000


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    import jax.numpy as jnp
    from mergenet_tpu.models import get_model, init_model
    from mergenet_tpu.models.resnet import ResNetBackbone
    from mergenet_tpu.models.layers import resize_bilinear

    H, W = 1024, 2048
    DH, DW = 512, 1024
    C, O = 9, 10

    model = get_model(C, O, "pspfpnet")
    params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                     (1, 256, 256, 3))
    variables = {"params": params, "batch_stats": batch_stats}
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, variables)

    bb = ResNetBackbone(layer=50)
    bb_vars = {"params": variables["params"]["ResNetBackbone_0"],
               "batch_stats": variables["batch_stats"]["ResNetBackbone_0"]}

    x = jnp.asarray(np.random.RandomState(0)
                    .rand(1, H, W, 3).astype(np.float32))

    @jax.jit
    def full(v, x):
        logits = model.apply(v, x.astype(jnp.bfloat16), train=False,
                             output_size=(DH, DW))
        return jnp.sum(jax.nn.sigmoid(logits.astype(jnp.float32)))

    @jax.jit
    def full_fullres(v, x):
        logits = model.apply(v, x.astype(jnp.bfloat16), train=False)
        return jnp.sum(jax.nn.sigmoid(logits.astype(jnp.float32)))

    @jax.jit
    def backbone(v, x):
        feats = bb.apply(v, x.astype(jnp.bfloat16), train=False)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    @jax.jit
    def resize_final(y):
        return jnp.sum(resize_bilinear(y, (DH, DW)).astype(jnp.float32))

    y_small = jnp.asarray(np.random.RandomState(1)
                          .rand(1, H // 4, W // 4, C + O)
                          .astype(np.float32)).astype(jnp.bfloat16)

    # head pieces at flagship shapes (fresh params — same ops/shapes)
    from mergenet_tpu.models.pspnet import (PyramidPoolingModule, FPNModule)
    rng = jax.random.PRNGKey(1)
    bf = jnp.bfloat16
    rnd = np.random.RandomState(2)
    feats = tuple(
        jnp.asarray(rnd.rand(1, H // s, W // s, c).astype(np.float32))
        .astype(bf)
        for s, c in ((4, 256), (8, 512), (16, 1024), (32, 2048)))

    ppm = PyramidPoolingModule(dtype=bf)
    ppm_v = ppm.init(rng, feats[3], train=False)
    fpn = FPNModule(C + O, dtype=bf)
    c5p = ppm.apply(ppm_v, feats[3], train=False)
    fpn_v = fpn.init(rng, feats[:3] + (c5p,), train=False)

    @jax.jit
    def head(pv, fv, feats):
        c5p = ppm.apply(pv, feats[3], train=False)
        y = fpn.apply(fv, feats[:3] + (c5p,), train=False)
        return jnp.sum(y.astype(jnp.float32))

    # the single biggest head op: 4-level fusion concat 3x3 conv 1024->256
    import flax.linen as nn
    fuse = nn.Conv(256, (3, 3), padding="SAME", dtype=bf)
    xfuse = jnp.asarray(rnd.rand(1, H // 4, W // 4, 1024)
                        .astype(np.float32)).astype(bf)
    fuse_v = fuse.init(rng, xfuse)

    @jax.jit
    def fusion_conv(v, x):
        return jnp.sum(fuse.apply(v, x).astype(jnp.float32))

    # stem: 7x7/2 conv + BN-relu + 3x3/2 maxpool at full res
    from mergenet_tpu.models.layers import max_pool
    stem = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                   use_bias=False, dtype=bf)
    stem_v = stem.init(rng, x[:, :8, :8, :].astype(bf))

    @jax.jit
    def stem_fn(v, x):
        y = nn.relu(stem.apply(v, x.astype(bf)))
        return jnp.sum(max_pool(y, window=3, stride=2,
                                padding=((1, 1), (1, 1)))
                       .astype(jnp.float32))

    # space-to-depth stem rewrite (same math; layers.StemConv7)
    from mergenet_tpu.models.layers import StemConv7
    s2d_mod = StemConv7(features=64, s2d=True, dtype=bf)
    s2d_v = {"params": {"kernel": stem_v["params"]["kernel"]}}

    @jax.jit
    def stem_s2d_fn(v, x):
        y = nn.relu(s2d_mod.apply(v, x.astype(bf)))
        return jnp.sum(max_pool(y, window=3, stride=2,
                                padding=((1, 1), (1, 1)))
                       .astype(jnp.float32))

    # full model with the s2d stem (same variables)
    model_s2d = model.clone(s2d_stem=True)

    @jax.jit
    def full_s2d(v, x):
        logits = model_s2d.apply(v, x.astype(jnp.bfloat16), train=False,
                                 output_size=(DH, DW))
        return jnp.sum(jax.nn.sigmoid(logits.astype(jnp.float32)))

    print("full (output_size 512x1024): %.2f ms" % timeit(full, variables, x))
    print("full (full-res logits):      %.2f ms"
          % timeit(full_fullres, variables, x))
    print("backbone only:               %.2f ms"
          % timeit(backbone, bb_vars, x))
    print("PPM+FPN head only:           %.2f ms"
          % timeit(head, ppm_v, fpn_v, feats))
    print("fusion 3x3 conv 1024->256 @256x512: %.2f ms"
          % timeit(fusion_conv, fuse_v, xfuse))
    print("stem conv7x7/2 + pool @1024x2048:   %.2f ms"
          % timeit(stem_fn, stem_v, x))
    print("stem s2d 4x4/1 + pool @1024x2048:   %.2f ms"
          % timeit(stem_s2d_fn, s2d_v, x))
    print("full with s2d stem:          %.2f ms"
          % timeit(full_s2d, variables, x))
    print("final resize 256x512x19 -> 512x1024 (bf16): %.2f ms"
          % timeit(resize_final, y_small))


if __name__ == "__main__":
    main()
