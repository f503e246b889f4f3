#!/usr/bin/env python3
"""Microbenchmarks of the decode's primitive costs on the TPU: segment
ops at various widths/segment counts, sorts at dedup shapes, and a
one-hot-matmul aggregation candidate.  Informs stage redesigns; not a
regression gate.

Usage: python scripts/bench_primitives.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    np.asarray(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(r)
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

    rng = np.random.RandomState(0)
    N = 512 * 1024
    C1 = 10
    # realistic flood labels: ~50k components, spatially clustered
    comp64k = jnp.asarray(
        np.sort(rng.randint(0, 50000, size=N)).astype(np.int32))
    comp8k = jnp.asarray(
        np.sort(rng.randint(0, 8000, size=N)).astype(np.int32))
    comp64k_rand = jnp.asarray(rng.randint(0, 50000, N).astype(np.int32))
    vals = jnp.asarray(rng.rand(N, C1).astype(np.float32))
    ones = jnp.ones((N,), jnp.int32)
    packed = jnp.asarray(rng.randint(0, 2**30, N).astype(np.int32))

    def seg_sum(v, c, m):
        return jnp.sum(jax.ops.segment_sum(v, c, num_segments=m))

    def seg_sum1(v, c, m):
        return jnp.sum(jax.ops.segment_sum(v, c, num_segments=m))

    def seg_max(v, c, m):
        return jnp.sum(jax.ops.segment_max(v, c, num_segments=m))

    for name, fn, args in [
        ("segment_sum (N,10) f32 -> 65536 sorted-ids",
         seg_sum, (vals, comp64k, 65536)),
        ("segment_sum (N,10) f32 -> 65536 random-ids",
         seg_sum, (vals, comp64k_rand, 65536)),
        ("segment_sum (N,10) f32 -> 8192 sorted-ids",
         seg_sum, (vals, comp8k, 8192)),
        ("segment_sum (N,) int32 ones -> 65536",
         seg_sum1, (ones, comp64k, 65536)),
        ("segment_sum (N,2) f32 -> 65536",
         seg_sum, (vals[:, :2], comp64k, 65536)),
        ("segment_max (N,) packed int32 -> 65536",
         seg_max, (packed, comp64k, 65536)),
        ("segment_max (N,) packed int32 -> 8192",
         seg_max, (packed, comp8k, 8192)),
    ]:
        t = timeit(jax.jit(fn, static_argnums=2), *args)
        print("%-52s %7.2f ms" % (name, t))

    # one-hot matmul aggregation candidate: (N,10)@8192 via per-tile
    # one_hot(comp)^T @ vals accumulated over a scan
    def onehot_agg(v, c, m, tile=2048):
        nt = N // tile
        cb = c.reshape(nt, tile)
        vb = v.reshape(nt, tile, C1)

        def body(acc, args):
            ci, vi = args
            oh = (ci[None, :] == jnp.arange(m, dtype=jnp.int32)[:, None])
            acc = acc + jnp.dot(oh.astype(jnp.bfloat16),
                                vi.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
            return acc, None

        acc, _ = jax.lax.scan(body, jnp.zeros((m, C1), jnp.float32),
                              (cb, vb))
        return jnp.sum(acc)

    for tile in (1024, 2048, 4096):
        t = timeit(jax.jit(lambda v, c: onehot_agg(v, c, 8192, tile)),
                   vals, comp8k)
        print("%-52s %7.2f ms" % (
            "one-hot matmul agg (N,10)->8192 tile=%d" % tile, t))

    # sorts at dedup shapes
    E = N * 10
    keys = jnp.asarray(rng.randint(0, 2**28, E).astype(np.int32))
    oml = jnp.asarray(rng.rand(E).astype(np.float32))

    def rowsort(k, o, block):
        R = E // block
        k2, o2 = jax.lax.sort((k.reshape(R, block), o.reshape(R, block)),
                              dimension=1, num_keys=1)
        return jnp.sum(k2[:, 0]) + jnp.sum(o2[:, 0])

    def rowsort_keyonly(k, block):
        R = E // block
        k2 = jax.lax.sort(k.reshape(R, block), dimension=1)
        return jnp.sum(k2[:, 0])

    for block in (1024, 2048, 4096, 8192):
        t = timeit(jax.jit(lambda k, o: rowsort(k, o, block)), keys, oml)
        print("%-52s %7.2f ms" % (
            "row sort (key,oml) 5.2M block=%d" % block, t))
    t = timeit(jax.jit(lambda k: rowsort_keyonly(k, 4096)), keys)
    print("%-52s %7.2f ms" % ("row sort KEY ONLY 5.2M block=4096", t))

    kg = jnp.asarray(rng.randint(0, 2**28, 327680).astype(np.int32))
    og = jnp.asarray(rng.rand(327680).astype(np.float32))
    t = timeit(jax.jit(lambda k, o: jnp.sum(
        jax.lax.sort((k, o), num_keys=1)[0])), kg, og)
    print("%-52s %7.2f ms" % ("global sort (key,oml) 327k", t))


if __name__ == "__main__":
    main()
