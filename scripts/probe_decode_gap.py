#!/usr/bin/env python3
"""Root-cause probe for the round-4 decode-time gap (VERDICT r4 #1b):
builder-measured 42.7 ms mean vs driver-measured 51.3 ms on the same
code/fixtures/device-kind.  Times decode_hierarchical on every committed
certification fixture at several iteration counts, prints per-fixture
per-iters ms so we can see (a) whether a fixed per-dispatch cost is
being amortized differently, (b) run-to-run spread, (c) whether any
fixture falls off the run-compaction fast path."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from bench import _fixture_scenes
    from mergenet_tpu.decoder.device import decode_hierarchical

    scenes, offsets = _fixture_scenes()
    num_classes = scenes[0][0].shape[-1]

    @jax.jit
    def decode(cp, sp):
        mask, inst_class = decode_hierarchical(
            cp, sp, num_classes, offsets, object_merge_factor=1.0,
            merge_logprob_bias=0.03, relabel=True)
        return jnp.sum(mask) + jnp.max(inst_class)

    pairs = [(jnp.asarray(c), jnp.asarray(s)) for c, s in scenes]
    float(decode(*pairs[0]))  # compile

    out = {}
    for iters in (3, 8, 20):
        per = []
        for fi, (c, s) in enumerate(pairs):
            float(decode(c, s))
            t0 = time.time()
            for _ in range(iters):
                r = decode(c, s)
            float(r)
            per.append(round((time.time() - t0) / iters * 1000, 2))
        out["iters_%d" % iters] = {
            "per_fixture_ms": per,
            "mean": round(float(np.mean(per)), 2),
        }
    # repeat the 8-iter pass to see run-to-run spread
    for rep in range(2):
        per = []
        for c, s in pairs:
            float(decode(c, s))
            t0 = time.time()
            for _ in range(8):
                r = decode(c, s)
            float(r)
            per.append(round((time.time() - t0) / 8 * 1000, 2))
        out["repeat_%d" % rep] = {
            "per_fixture_ms": per,
            "mean": round(float(np.mean(per)), 2),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
