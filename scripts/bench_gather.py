#!/usr/bin/env python3
"""Null-calibrated microbench of gather/scatter/contract primitives at
decode shapes.  Establishes the real cost of N-sized gathers (the axon
relay adds a per-dispatch floor; the null row measures it).

Usage: python scripts/bench_gather.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=16, warmup=3):
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

    rng = np.random.RandomState(0)
    N = 512 * 1024
    M = 65536
    M2 = 8192
    idxN_rand = jnp.asarray(rng.randint(0, M, N).astype(np.int32))
    idxN_local = jnp.asarray(
        np.minimum(np.arange(N) // 8 + rng.randint(0, 4, N), M - 1)
        .astype(np.int32))
    idxN_small = jnp.asarray(rng.randint(0, M2, N).astype(np.int32))
    idxM = jnp.asarray(rng.randint(0, M, M).astype(np.int32))
    tabM = jnp.asarray(rng.randint(0, 2**30, M).astype(np.int32))
    tabM2 = jnp.asarray(rng.randint(0, 2**30, M2).astype(np.int32))
    tabN = jnp.asarray(rng.randint(0, N, N).astype(np.int32))
    idxNN = jnp.asarray(rng.randint(0, N, N).astype(np.int32))

    rows = [
        ("null (sum of N idx)", lambda: jnp.sum(idxN_rand)),
        ("gather tab[M=65536] by N rand idx",
         lambda: jnp.sum(tabM[idxN_rand])),
        ("gather tab[M=65536] by N local idx",
         lambda: jnp.sum(tabM[idxN_local])),
        ("gather tab[M2=8192] by N idx",
         lambda: jnp.sum(tabM2[idxN_small])),
        ("gather tab[N=512k] by N idx",
         lambda: jnp.sum(tabN[idxNN])),
        ("gather tab[M] by M idx",
         lambda: jnp.sum(tabM[idxM])),
        ("2x gather tab[M] by N idx (dependent)",
         lambda: jnp.sum(tabM[jnp.minimum(tabM[idxN_rand], M - 1)])),
        ("contract unroll at M (17 pointer jumps)",
         lambda: jnp.sum(D._contract(idxM % M, unroll=True))),
    ]
    base = None
    for name, fn in rows:
        t = timeit(jax.jit(fn))
        if base is None:
            base = t
        print("%-52s %7.2f ms  (net %6.2f)" % (name, t, t - base))


if __name__ == "__main__":
    main()
