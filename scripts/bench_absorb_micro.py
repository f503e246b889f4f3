#!/usr/bin/env python3
"""Micro-bench of the absorb-stage pieces of decode_hierarchical on the
committed fixture: per-piece jits over materialized stage-1 outputs, so
each piece's cost is visible in isolation (the cumulative-prefix stage
bench hides which piece inside stage 2 moved).

Usage: python scripts/bench_absorb_micro.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    return (time.time() - t0) / iters * 1000


if __name__ == "__main__":
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    import jax.numpy as jnp
    from mergenet_tpu.decoder import device as D
    from mergenet_tpu.ops.pallas.absorb import absorb_best_edges

    fix = os.path.join("tests", "fixtures", "certification512")
    d = np.load(os.path.join(fix, "probs_0.npz"))
    offsets = tuple(tuple(int(v) for v in o)
                    for o in np.load(os.path.join(fix, "offsets.npy")))
    cp = jnp.asarray(d["cp"].astype(np.float32))
    sp = jnp.asarray(d["sp"].astype(np.float32))
    C = cp.shape[-1]
    H, W = cp.shape[:2]
    omf, bias = jnp.float32(1.0), jnp.float32(0.03)
    M, M2 = 65536, 8192
    f32 = jnp.float32
    theta, size_cap = 1.0, 64

    @jax.jit
    def stage1(cp, sp):
        cls_lp_pix, log_odds = D._log_domain(cp, sp, 0.0)
        argmax_pix = jnp.argmax(cls_lp_pix, axis=-1)
        label = D._flood_fill(argmax_pix, log_odds, offsets, "sum", omf,
                              bias, 3, 2.0)
        comp2d, cls_lp, size, frozen, _, runs = D._densify_stats(
            label, cls_lp_pix, M, return_runs=True)
        return cls_lp_pix, log_odds, comp2d, cls_lp, size, frozen, runs

    outs = stage1(cp, sp)
    outs = jax.tree_util.tree_map(jnp.asarray, jax.device_get(outs))
    cls_lp_pix, log_odds, comp2d, cls_lp, size, frozen, runs = outs
    comp_c = runs[1]

    @jax.jit
    def piece_pack(cls_lp, size, frozen, comp_c, comp2d, runs):
        argcls = jnp.argmax(cls_lp, axis=1).astype(jnp.int32)
        packed = ((jnp.minimum(size, (1 << 26) - 1) << 5)
                  | (argcls << 1) | frozen.astype(jnp.int32))
        return D._run_apply(packed, comp_c, comp2d, runs)

    packed_own = jnp.asarray(jax.device_get(
        piece_pack(cls_lp, size, frozen, comp_c, comp2d, runs)))

    @jax.jit
    def piece_kernel(comp2d, packed_own, log_odds):
        return absorb_best_edges(comp2d, packed_own, log_odds, offsets,
                                 theta, size_cap)

    bp_, partner_ = piece_kernel(comp2d, packed_own, log_odds)
    bp_ = jnp.asarray(jax.device_get(bp_))
    partner_ = jnp.asarray(jax.device_get(partner_))

    @jax.jit
    def piece_segmax(bp2d, partner2d, comp2d, comp_c, runs):
        bp = bp2d.reshape(-1)
        partner_f = partner2d.reshape(-1)
        partner_bits = max(1, int(np.ceil(np.log2(M + 2))))
        q_levels = (1 << (31 - partner_bits)) - 1
        q = jnp.clip((bp - f32(theta)) * f32(q_levels / 16.0),
                     0, q_levels - 1).astype(jnp.int32) + 1
        packed_edge = jnp.where(
            (bp >= f32(theta)) & (partner_f >= 0),
            (q << partner_bits) | (partner_f + 1), 0)
        return D._run_segment_max(packed_edge.reshape(H, W), comp2d,
                                  comp_c, runs, M)

    best_packed = jnp.asarray(jax.device_get(
        piece_segmax(bp_, partner_, comp2d, comp_c, runs)))

    @jax.jit
    def piece_contract(best_packed, cls_lp, size):
        partner_bits = max(1, int(np.ceil(np.log2(M + 2))))
        hook = best_packed > 0
        partner = (best_packed & ((1 << partner_bits) - 1)) - 1
        ids = jnp.arange(M, dtype=jnp.int32)
        parent = D._contract(jnp.where(hook, jnp.maximum(partner, 0), ids))
        dying = parent != ids
        cls_lp = cls_lp.at[parent].add(
            jnp.where(dying[:, None], cls_lp, 0.0))
        cls_lp = jnp.where(dying[:, None], 0.0, cls_lp)
        size2 = size + jax.ops.segment_sum(jnp.where(dying, size, 0),
                                           parent, num_segments=M)
        size2 = jnp.where(dying, 0, size2)
        return parent, cls_lp, size2

    print("pack+run_apply      %7.2f ms" % timeit(
        piece_pack, cls_lp, size, frozen, comp_c, comp2d, runs))
    print("pallas kernel       %7.2f ms" % timeit(
        piece_kernel, comp2d, packed_own, log_odds))
    print("quant+run_segmax    %7.2f ms" % timeit(
        piece_segmax, bp_, partner_, comp2d, comp_c, runs))
    print("contract+tables     %7.2f ms" % timeit(
        piece_contract, best_packed, cls_lp, size))
