#!/usr/bin/env python3
"""Quick decode-only timing over ALL committed certification fixtures —
the bench.py decode stage without the net (for perf iteration).

Usage: python scripts/bench_decode_quick.py [iters]
"""

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
    from bench import _fixture_scenes
    from mergenet_tpu.decoder.device import decode_hierarchical

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    scenes, offsets = _fixture_scenes()
    num_classes = scenes[0][0].shape[-1]

    @jax.jit
    def decode(cp, sp):
        mask, inst_class = decode_hierarchical(
            cp, sp, num_classes, offsets, object_merge_factor=1.0,
            merge_logprob_bias=0.03, relabel=True)
        return jnp.sum(mask) + jnp.max(inst_class)

    pairs = [(jnp.asarray(c), jnp.asarray(s)) for c, s in scenes]
    per = []
    sums = []
    for c, s in pairs:
        sums.append(float(decode(c, s)))  # warmup + output fingerprint
        t0 = time.time()
        for _ in range(iters):
            r = decode(c, s)
        float(r)
        per.append((time.time() - t0) / iters * 1000)
    print("decode ms per fixture:", " ".join("%.1f" % p for p in per))
    print("mean %.2f  min %.2f  max %.2f  (n=%d)"
          % (float(np.mean(per)), min(per), max(per), len(per)))
    print("output fingerprints:", " ".join("%.0f" % s for s in sums))


if __name__ == "__main__":
    main()
