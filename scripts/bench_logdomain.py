#!/usr/bin/env python3
"""Microbench of `_log_domain` pieces at the 512x1024 decode shape: is
the 5+ ms stage cost the elementwise log math or the (H, W, O) ->
(O, H, W) minor-to-major transpose?  Informs whether a Pallas transpose
(or an (O, W, H) layout change) is worth building.

Usage: python scripts/bench_logdomain.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=16, warmup=2):
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
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    import jax.numpy as jnp
    from mergenet_tpu.decoder import device as D

    fix = os.path.join("tests", "fixtures", "certification512")
    d = np.load(os.path.join(fix, "probs_0.npz"))
    cp = jnp.asarray(d["cp"].astype(np.float32))
    sp = jnp.asarray(d["sp"].astype(np.float32))
    H, W, C = cp.shape
    O = sp.shape[-1]
    print("shape", (H, W, C, O))

    @jax.jit
    def full(cp, sp):
        a, b = D._log_domain(cp, sp, 0.0)
        return jnp.sum(a) + jnp.sum(b)

    @jax.jit
    def no_transpose(cp, sp):
        f32 = jnp.float32
        eps = f32(1.1920929e-07)
        cpc = jnp.clip(cp, eps, 1.0 - eps)
        spc = jnp.clip(sp, eps, 1.0 - eps)   # stays (H, W, O)
        return (jnp.sum(jnp.log(cpc))
                + jnp.sum(jnp.log(spc) - jnp.log1p(-spc)))

    @jax.jit
    def transpose_only(sp):
        return jnp.sum(jnp.moveaxis(sp, -1, 0) * 1.0001)

    @jax.jit
    def transpose_owh(sp):
        # (H, W, O) -> (O, W, H): the run-dedup layout — same cost class?
        return jnp.sum(sp.transpose(2, 1, 0) * 1.0001)

    @jax.jit
    def logdom_argmax(cp, sp):
        a, b = D._log_domain(cp, sp, 0.0)
        am = jnp.argmax(a, axis=-1)
        return jnp.sum(a) + jnp.sum(b) + jnp.sum(am)

    for name, fn, args in (
            ("_log_domain (full)", full, (cp, sp)),
            ("elementwise only (no transpose)", no_transpose, (cp, sp)),
            ("moveaxis (H,W,O)->(O,H,W) only", transpose_only, (sp,)),
            ("transpose (H,W,O)->(O,W,H) only", transpose_owh, (sp,)),
            ("_log_domain + argmax", logdom_argmax, (cp, sp)),
    ):
        print("%-36s %.2f ms" % (name, timeit(fn, *args)))


if __name__ == "__main__":
    main()
