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

    print("full (output_size 512x1024): %.2f ms" % timeit(full, variables, x))
    print("full (full-res logits):      %.2f ms"
          % timeit(full_fullres, variables, x))
    print("backbone only:               %.2f ms"
          % timeit(backbone, bb_vars, x))
    print("final resize 256x512x19 -> 512x1024 (bf16): %.2f ms"
          % timeit(resize_final, y_small))


if __name__ == "__main__":
    main()
