#!/usr/bin/env python3
"""Per-stage timings of decode_hierarchical by driving its internal stage
functions directly on the committed certification fixture (the bench.py
decode workload).  Cumulative-prefix jits isolate each stage's marginal
cost including the fusion XLA actually performs across stage boundaries.

Usage: python scripts/bench_hier_stages.py
"""

import os
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
    from mergenet_tpu.decoder import device as D

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

    def s_logdom(cp, sp):
        cls_lp_pix, log_odds = D._log_domain(cp, sp, 0.0)
        return jnp.sum(cls_lp_pix) + jnp.sum(log_odds)

    def upto_flood(cp, sp):
        cls_lp_pix, log_odds = D._log_domain(cp, sp, 0.0)
        argmax_pix = jnp.argmax(cls_lp_pix, axis=-1)
        label = D._flood_fill(argmax_pix, log_odds, offsets, "sum", omf,
                              bias, 3, 2.0)
        return jnp.sum(label)

    def upto_densify(cp, sp):
        cls_lp_pix, log_odds = D._log_domain(cp, sp, 0.0)
        argmax_pix = jnp.argmax(cls_lp_pix, axis=-1)
        label = D._flood_fill(argmax_pix, log_odds, offsets, "sum", omf,
                              bias, 3, 2.0)
        comp2d, cls_lp, size, frozen, _ = D._densify_stats(
            label, cls_lp_pix, M)
        return jnp.sum(comp2d) + jnp.sum(cls_lp) + jnp.sum(size)

    def no_absorb_no_rounds(cp, sp):
        label, rc, ii = D.decode_hierarchical(
            cp, sp, C, offsets, object_merge_factor=1.0,
            merge_logprob_bias=0.03, absorb_thetas=(), pair_rounds=0)
        return jnp.sum(label)

    def upto_absorb(cp, sp):
        label, rc, ii = D.decode_hierarchical(
            cp, sp, C, offsets, object_merge_factor=1.0,
            merge_logprob_bias=0.03, pair_rounds=0)
        return jnp.sum(label)

    def full(cp, sp):
        label, rc, ii = D.decode_hierarchical(cp, sp, C, offsets,
                                              object_merge_factor=1.0,
                                              merge_logprob_bias=0.03)
        m, ic = D.relabel_mask(label, rc, ii)
        return jnp.sum(m) + jnp.max(ic)

    def no_relabel(cp, sp):
        label, rc, ii = D.decode_hierarchical(cp, sp, C, offsets,
                                              object_merge_factor=1.0,
                                              merge_logprob_bias=0.03)
        return jnp.sum(label)

    names = [
        ("log domain only", s_logdom),
        ("+ flood fill", upto_flood),
        ("+ densify/stats", upto_densify),
        ("+ dedup, NO absorb (thetas=(), rounds=0)", no_absorb_no_rounds),
        ("+ absorb round (rounds=0)", upto_absorb),
        ("+ pair rounds (full, no relabel)", no_relabel),
        ("+ relabel (full)", full),
    ]
    prev = 0.0
    for name, fn in names:
        t = timeit(jax.jit(fn), cp, sp)
        print("%-52s %7.2f ms  (delta %+6.2f)" % (name, t, t - prev))
        prev = t


if __name__ == "__main__":
    main()
