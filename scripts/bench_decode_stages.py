#!/usr/bin/env python3
"""Decode stage microbenchmark on the attached TPU.

Times decode_hierarchical end-to-end at the reference 512x1024 decode size
on the trained-stats scene (the bench.py decode workload), plus isolated
pieces (pair dedup with/without stream compaction) to steer optimization.

Usage: python scripts/bench_decode_stages.py [--quick]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=8, warmup=2):
    import jax
    for _ in range(warmup):
        r = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, r)
    return (time.time() - t0) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mergenet_tpu.core import generate_offsets
    from mergenet_tpu.decoder import device as D
    from bench import _trained_stats_scene

    num_classes, num_offsets = 9, 10
    offsets = tuple(generate_offsets(40, num_offsets))
    DH, DW = 512, 1024
    cp, sp = _trained_stats_scene(DH, DW, num_classes, offsets)
    cp, sp = jnp.asarray(cp), jnp.asarray(sp)

    common = dict(object_merge_factor=1.0, merge_logprob_bias=0.03)

    @jax.jit
    def hier_default(cp, sp):
        label, rc, ii = D.decode_hierarchical(cp, sp, num_classes, offsets,
                                              **common)
        m, ic = D.relabel_mask(label, rc, ii)
        return jnp.sum(m) + jnp.max(ic)

    @jax.jit
    def hier_uncompacted(cp, sp):
        label, rc, ii = D.decode_hierarchical(
            cp, sp, num_classes, offsets, edge_slots=DH * DW * num_offsets,
            **common)
        m, ic = D.relabel_mask(label, rc, ii)
        return jnp.sum(m) + jnp.max(ic)

    @jax.jit
    def hier_stats(cp, sp):
        label, rc, ii, st = D.decode_hierarchical(
            cp, sp, num_classes, offsets, return_stats=True, **common)
        m, ic = D.relabel_mask(label, rc, ii)
        return st

    st = jax.tree_util.tree_map(int, hier_stats(cp, sp))
    print("stats:", st)
    t_def = timeit(hier_default, cp, sp)
    print("decode_hierarchical default (edge_slots=512k): %.1f ms" % t_def)
    if not args.quick:
        t_unc = timeit(hier_uncompacted, cp, sp)
        print("decode_hierarchical uncompacted:            %.1f ms" % t_unc)

    # isolated primitive costs at E = 5.2M
    E = DH * DW * num_offsets
    x = jnp.asarray(np.random.RandomState(0).randint(
        0, 2 ** 30, E).astype(np.int32))
    v = jnp.asarray(np.random.RandomState(1).rand(E).astype(np.float32))
    ext = jnp.asarray((np.random.RandomState(2).rand(E) < 0.06))

    @jax.jit
    def sort2(x, v):
        a, b = jax.lax.sort((x, v), num_keys=1)
        return a[0] + b[0]

    @jax.jit
    def topk_compact(ext, x, v):
        score = jnp.where(ext, -jnp.arange(E, dtype=jnp.int32),
                          jnp.int32(-(2 ** 31 - 1)))
        _, kept = jax.lax.top_k(score, 524288)
        return x[kept][0] + v[kept][0]

    @jax.jit
    def cumsum_i32(ext):
        return jnp.cumsum(ext.astype(jnp.int32))[-1]

    print("sort (2-array, 1-key) @5.2M: %.1f ms" % timeit(sort2, x, v))
    print("top_k 512k @5.2M + 2 gathers: %.1f ms"
          % timeit(topk_compact, ext, x, v))
    print("cumsum i32 @5.2M: %.1f ms" % timeit(cumsum_i32, ext))

    # densify/absorb primitive costs at N = 512k, M = 65536
    N, M, C = DH * DW, 65536, num_classes
    comp = jnp.asarray(np.random.RandomState(3).randint(
        0, 40000, N).astype(np.int32))
    clsp = jnp.asarray(np.random.RandomState(4).rand(N, C)
                       .astype(np.float32))
    pri = jnp.asarray(np.random.RandomState(5).rand(N).astype(np.float32))

    @jax.jit
    def seg_sum_cls(comp, clsp):
        return jax.ops.segment_sum(clsp, comp, num_segments=M)[0, 0]

    @jax.jit
    def seg_sum_size(comp):
        return jax.ops.segment_sum(jnp.ones((N,), jnp.int32), comp,
                                   num_segments=M)[0]

    @jax.jit
    def seg_max_pri(comp, pri):
        return jax.ops.segment_max(pri, comp, num_segments=M)[0]

    @jax.jit
    def sorted_stats(comp, clsp):
        pc, pidx = jax.lax.sort((comp, jnp.arange(N, dtype=jnp.int32)),
                                num_keys=1)
        g = clsp[pidx]
        cs = jnp.cumsum(g, axis=0)
        ends = jnp.searchsorted(pc, jnp.arange(M, dtype=jnp.int32),
                                side="right").astype(jnp.int32) - 1
        s = jnp.where((ends >= 0)[:, None], cs[jnp.maximum(ends, 0)], 0.0)
        out = s - jnp.concatenate([jnp.zeros((1, C)), s[:-1]])
        return out[0, 0]

    @jax.jit
    def sorted_max(comp, pri):
        pc, ps = jax.lax.sort((comp, pri), num_keys=2)
        ends = jnp.searchsorted(pc, jnp.arange(M, dtype=jnp.int32),
                                side="right").astype(jnp.int32) - 1
        return jnp.where(ends >= 0, ps[jnp.maximum(ends, 0)], -1.0)[0]

    print("segment_sum (N,9)->65536 @512k: %.1f ms"
          % timeit(seg_sum_cls, comp, clsp))
    print("segment_sum sizes ->65536 @512k: %.1f ms"
          % timeit(seg_sum_size, comp))
    print("segment_max ->65536 @512k: %.1f ms"
          % timeit(seg_max_pri, comp, pri))
    print("sorted-stats (sort+gather+cumsum+searchsorted) @512k: %.1f ms"
          % timeit(sorted_stats, comp, clsp))
    print("sorted-max (2-key sort+searchsorted) @512k: %.1f ms"
          % timeit(sorted_max, comp, pri))


if __name__ == "__main__":
    main()
