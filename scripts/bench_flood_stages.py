#!/usr/bin/env python3
"""Flood-fill internal breakdown on the attached TPU.

Times `_flood_fill` (scans + contraction) and its pieces at the reference
512x1024 decode size on the trained-stats scene, to size the win of a
fused Pallas scan kernel.
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
    from mergenet_tpu.core import generate_offsets
    from mergenet_tpu.decoder import device as D
    from bench import _trained_stats_scene

    num_classes, num_offsets = 9, 10
    offsets = tuple(generate_offsets(40, num_offsets))
    DH, DW = 512, 1024
    cp, sp = _trained_stats_scene(DH, DW, num_classes, offsets)
    cp, sp = jnp.asarray(cp), jnp.asarray(sp)

    @jax.jit
    def prep(cp, sp):
        cls_lp, lo = D._log_domain(cp, sp, 0.0)
        return jnp.argmax(cls_lp, -1), lo, cls_lp

    argmax_pix, log_odds, cls_lp_pix = jax.tree_util.tree_map(
        jnp.asarray, prep(cp, sp))

    f32 = jnp.float32

    @jax.jit
    def flood_full(a, lo):
        lab = D._flood_fill(a, lo, offsets, "sum", f32(1.0), f32(0.03),
                            3, 2.0)
        return jnp.sum(lab)

    def flood_noncanon(a, lo):
        """_flood_fill minus the final _contract (scan sweeps only)."""
        import mergenet_tpu.decoder.device as dd
        orig = dd._contract
        try:
            dd._contract = lambda p, **kw: p
            fn = jax.jit(lambda a, lo: jnp.sum(
                dd._flood_fill(a, lo, offsets, "sum", f32(1.0), f32(0.03),
                               3, 2.0)))
            return fn
        finally:
            dd._contract = orig

    # build the scan-only jit while _contract is stubbed; restore after
    import mergenet_tpu.decoder.device as dd
    orig = dd._contract
    dd._contract = lambda p, **kw: p
    scans_only = jax.jit(lambda a, lo: jnp.sum(
        dd._flood_fill(a, lo, offsets, "sum", f32(1.0), f32(0.03), 3, 2.0)))
    t_scans = timeit(scans_only, argmax_pix, log_odds)
    dd._contract = orig

    t_full = timeit(flood_full, argmax_pix, log_odds)

    lab_nc = jax.jit(lambda a, lo: dd._flood_fill(
        a, lo, offsets, "sum", f32(1.0), f32(0.03), 3, 2.0))(
        argmax_pix, log_odds)

    @jax.jit
    def contract_only(lab):
        return jnp.sum(D._contract(lab.reshape(-1), two_cycle_break=False))

    t_con = timeit(contract_only, lab_nc)

    @jax.jit
    def densify(lab, clp):
        c2d, cl, sz, fr, n = D._densify_stats(lab, clp, 65536)
        return jnp.sum(sz) + jnp.sum(cl) + n

    t_den = timeit(densify, lab_nc, cls_lp_pix)

    print("flood full (3 sweeps + contract): %.2f ms" % t_full)
    print("flood scans only (contract stubbed): %.2f ms" % t_scans)
    print("contract alone (on canonical labels): %.2f ms" % t_con)
    print("densify+stats (M=65536): %.2f ms" % t_den)


if __name__ == "__main__":
    main()
