#!/usr/bin/env python3
"""A/B decode variants at 512x1024 on the trained-stats scene."""

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
    common = dict(object_merge_factor=1.0, merge_logprob_bias=0.03)

    def mk(**kw):
        @jax.jit
        def f(cp, sp):
            label, rc, ii = D.decode_hierarchical(cp, sp, num_classes,
                                                  offsets, **common, **kw)
            m, ic = D.relabel_mask(label, rc, ii)
            return jnp.sum(m) + jnp.max(ic)
        return f

    for name, kw in [
            ("default", {}),
            ("pair_slots=16384", dict(pair_slots=16384)),
            ("edge_slots=262144", dict(edge_slots=262144)),
            ("ccl_sweeps=2", dict(ccl_sweeps=2)),
            ("pair_rounds=32", dict(pair_rounds=32)),
            ("combo slots16k+edges256k", dict(pair_slots=16384,
                                              edge_slots=262144)),
    ]:
        print("%-28s %.1f ms" % (name, timeit(mk(**kw), cp, sp)))

    # searchsorted-based compaction primitive at E=5.2M, K=262144
    E, K = DH * DW * num_offsets, 262144
    rng = np.random.RandomState(0)
    key = jnp.asarray(rng.randint(0, 2 ** 30, E).astype(np.int32))
    v = jnp.asarray(rng.rand(E).astype(np.float32))
    ext = jnp.asarray(rng.rand(E) < 0.042)

    @jax.jit
    def compact_searchsorted(ext, key, v):
        cum = jnp.cumsum(ext.astype(jnp.int32))
        kept = jnp.searchsorted(cum, jnp.arange(1, K + 1, dtype=jnp.int32))
        kept = jnp.minimum(kept, E - 1)
        valid = jnp.arange(K) < cum[-1]
        kk = jnp.where(valid, key[kept], 2 ** 30)
        vv = jnp.where(valid, v[kept], 0.0)
        a, b = jax.lax.sort((kk, vv), num_keys=1)
        return a[0] + b[0]

    print("searchsorted compaction+sort@262k: %.1f ms"
          % timeit(compact_searchsorted, ext, key, v))


if __name__ == "__main__":
    main()
