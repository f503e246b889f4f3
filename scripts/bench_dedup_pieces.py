#!/usr/bin/env python3
"""Piecewise timings of the block-dedup and absorb stages on the real
certification fixture — cumulative prefixes through _block_dedup's
internals and the absorb round's internals.

Usage: python scripts/bench_dedup_pieces.py
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
    P = M2 + 1
    SENT = P * P - 1
    block, slots, pair_slots = 4096, 256, 16384

    # build the REAL post-absorb comp2d/log_odds once (host-side fixture)
    @jax.jit
    def upto_stage3(cp, sp):
        cls_lp_pix, log_odds = D._log_domain(cp, sp, 0.0)
        argmax_pix = jnp.argmax(cls_lp_pix, axis=-1)
        label = D._flood_fill(argmax_pix, log_odds, offsets, "sum", omf,
                              bias, 3, 2.0)
        comp2d, cls_lp, size, frozen, _ = D._densify_stats(
            label, cls_lp_pix, M)
        return comp2d, cls_lp, size, frozen, log_odds

    comp2d, cls_lp, size, frozen, log_odds = jax.tree.map(
        jnp.asarray, upto_stage3(cp, sp))
    # stage-3 re-densify (absorb skipped: comp ids valid for M2 clamp)
    live = size > 0
    dense2 = (jnp.cumsum(live.astype(jnp.int32)) - 1).astype(jnp.int32)
    map2 = jnp.where(live, jnp.minimum(dense2, M2 - 1), 0)
    comp2d_s = np.asarray(map2)[np.asarray(comp2d)]
    comp2d_s = jnp.asarray(comp2d_s)
    froz2d = jnp.zeros((H, W), bool)

    # ---- key build + dedup prefixes ----
    def keybuild(comp2d, log_odds):
        keys = []
        for oi, (di, dj) in enumerate(offsets):
            c2 = D._shift2d(comp2d, di, dj, -1)
            ext = (c2 >= 0) & (c2 != comp2d)
            lo = jnp.minimum(comp2d, c2)
            hi = jnp.maximum(comp2d, c2)
            keys.append(jnp.where(ext, lo * P + hi, SENT).reshape(-1))
        return jnp.concatenate(keys), log_odds.reshape(-1)

    def p_keys(c, lo):
        k, o = keybuild(c, lo)
        return jnp.sum(k) + jnp.sum(o)

    def p_rowsort(c, lo):
        k, o = keybuild(c, lo)
        E = int(k.shape[0])
        R = E // block
        k2, o2 = jax.lax.sort((k.reshape(R, block), o.reshape(R, block)),
                              dimension=1, num_keys=1)
        return jnp.sum(k2[:, 0]) + jnp.sum(o2[:, 0])

    def p_runs(c, lo):
        k, o = keybuild(c, lo)
        E = int(k.shape[0])
        R = E // block
        k2, o2 = jax.lax.sort((k.reshape(R, block), o.reshape(R, block)),
                              dimension=1, num_keys=1)
        dead = k2 >= SENT
        first = jnp.concatenate(
            [jnp.ones((R, 1), bool), k2[:, 1:] != k2[:, :-1]], axis=1)
        run_id = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
        tot = D._stable_cumsum_rows(jnp.where(dead, 0.0, o2))
        return jnp.sum(run_id[:, -1]) + jnp.sum(tot[:, -1])

    def p_sort2(c, lo):
        k, o = keybuild(c, lo)
        E = int(k.shape[0])
        R = E // block
        k2, o2 = jax.lax.sort((k.reshape(R, block), o.reshape(R, block)),
                              dimension=1, num_keys=1)
        dead = k2 >= SENT
        first = jnp.concatenate(
            [jnp.ones((R, 1), bool), k2[:, 1:] != k2[:, :-1]], axis=1)
        run_id = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
        tot = D._stable_cumsum_rows(jnp.where(dead, 0.0, o2))
        last = jnp.concatenate([first[:, 1:], jnp.ones((R, 1), bool)],
                               axis=1)
        sel = last & ~dead
        ordkey = jnp.where(sel & (run_id < slots), run_id,
                           slots).astype(jnp.int32)
        ord_s, k_s, t_s = jax.lax.sort((ordkey, k2, tot), dimension=1,
                                       num_keys=1)
        return jnp.sum(ord_s[:, 0]) + jnp.sum(k_s[:, 0]) \
            + jnp.sum(t_s[:, 0])

    def p_full(c, lo):
        k, o = keybuild(c, lo)
        plo, phi, po, st = D._block_dedup(k, o, P, SENT, pair_slots,
                                          block, slots)
        return jnp.sum(plo) + jnp.sum(po) + st["n_ext"]

    prev = 0.0
    for name, fn in [("key build (10 offsets + concat)", p_keys),
                     ("+ row sort (key,oml)", p_rowsort),
                     ("+ run ids + compensated row cumsum", p_runs),
                     ("+ compaction row sort (3-array)", p_sort2),
                     ("+ global finish (full _block_dedup)", p_full)]:
        t = timeit(jax.jit(fn), comp2d_s, log_odds)
        print("%-52s %7.2f ms  (delta %+6.2f)" % (name, t, t - prev))
        prev = t

    # ---- absorb internals ----
    from mergenet_tpu.ops.pallas.absorb import absorb_best_edges, \
        absorb_scan_supported
    print("pallas absorb supported:", absorb_scan_supported(H, W))
    argcls = jnp.argmax(cls_lp, axis=1).astype(jnp.int32)
    packed = ((jnp.minimum(size, (1 << 26) - 1) << 5)
              | (argcls << 1) | frozen.astype(jnp.int32))

    def a_gather(comp2d, packed):
        return jnp.sum(packed[comp2d])

    def a_scan(comp2d, packed, log_odds):
        packed_own = packed[comp2d]
        bp, bpart = absorb_best_edges(comp2d, packed_own, log_odds,
                                      offsets, 1.0, 64)
        return jnp.sum(bp) + jnp.sum(bpart)

    def a_segmax(comp2d, packed, log_odds):
        packed_own = packed[comp2d]
        bp, bpart = absorb_best_edges(comp2d, packed_own, log_odds,
                                      offsets, 1.0, 64)
        bpf = bp.reshape(-1)
        partner_f = bpart.reshape(-1)
        own_f = comp2d.reshape(-1)
        partner_bits = max(1, int(np.ceil(np.log2(M + 2))))
        q_levels = (1 << (31 - partner_bits)) - 1
        q = jnp.clip((bpf - 1.0) * (q_levels / 16.0),
                     0, q_levels - 1).astype(jnp.int32) + 1
        packed_edge = jnp.where((bpf >= 1.0) & (partner_f >= 0),
                                (q << partner_bits) | (partner_f + 1), 0)
        best_packed = jax.ops.segment_max(packed_edge, own_f,
                                          num_segments=M)
        return jnp.sum(best_packed)

    prev = 0.0
    for name, fn in [("absorb: packed gather only", a_gather),
                     ("absorb: + pallas edge scan",
                      lambda c, p: a_scan(c, p, log_odds)),
                     ("absorb: + packed segment_max",
                      lambda c, p: a_segmax(c, p, log_odds))]:
        t = timeit(jax.jit(fn), comp2d, packed)
        print("%-52s %7.2f ms  (delta %+6.2f)" % (name, t, t - prev))
        prev = t


if __name__ == "__main__":
    main()
