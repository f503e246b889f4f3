#!/usr/bin/env python3
"""Quick full-decode timer on the certification fixture with
configurable decode_hierarchical kwargs from the command line.

Usage: python scripts/bench_decode_quick.py [k=v ...]
  e.g. python scripts/bench_decode_quick.py dedup_block=2048 dedup_slots=192
"""

import ast
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    import jax.numpy as jnp
    from mergenet_tpu.decoder.device import decode_hierarchical, \
        relabel_mask

    kwargs = {}
    for a in sys.argv[1:]:
        k, v = a.split("=", 1)
        kwargs[k] = ast.literal_eval(v)

    fix = os.path.join("tests", "fixtures", "certification512")
    d = np.load(os.path.join(fix, "probs_0.npz"))
    offsets = tuple(tuple(int(v) for v in o)
                    for o in np.load(os.path.join(fix, "offsets.npy")))
    cp = jnp.asarray(d["cp"].astype(np.float32))
    sp = jnp.asarray(d["sp"].astype(np.float32))
    C = cp.shape[-1]

    @jax.jit
    def full(cp, sp):
        label, rc, ii = decode_hierarchical(
            cp, sp, C, offsets, object_merge_factor=1.0,
            merge_logprob_bias=0.03, **kwargs)
        m, ic = relabel_mask(label, rc, ii)
        return jnp.sum(m) + jnp.max(ic), m

    iters = 16
    for _ in range(3):
        s, m = full(cp, sp)
    np.asarray(s)
    t0 = time.time()
    for _ in range(iters):
        s, m = full(cp, sp)
    np.asarray(s)
    t = (time.time() - t0) / iters * 1000
    mask = np.asarray(m)
    print("decode %.2f ms  kwargs=%s  mask_sum=%d n_inst=%d"
          % (t, kwargs, int(mask.sum()), int(np.asarray(s))
             and len(np.unique(mask)) - 1))


if __name__ == "__main__":
    main()
