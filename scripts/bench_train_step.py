#!/usr/bin/env python3
"""Train-step timings at the docs/benchmarks.md "Training" table shapes
(PSPFPNet-r50, combined class+offset BCE alpha=20), one chip.

Usage: python scripts/bench_train_step.py [--profile]
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
    from mergenet_tpu.models import get_model
    from mergenet_tpu.parallel.train import (build_train_step,
                                             create_train_state,
                                             make_optimizer)

    profile = "--profile" in sys.argv
    C, O = 9, 10
    rng = np.random.RandomState(0)

    for name, batch, crop, bf16, remat in [
        ("f32 b8 crop512", 8, 512, False, False),
        ("bf16 b8 crop512", 8, 512, True, False),
        ("bf16 b16 crop768 (reference full config)", 16, 768, True,
         False),
        ("bf16 b16 crop768 + remat", 16, 768, True, True),
    ]:
        model = get_model(C, O, "pspfpnet",
                          dtype=jnp.bfloat16 if bf16 else None,
                          verbose=False)
        tx = make_optimizer()
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   (1, 128, 128, 3))
        step = build_train_step(C, O, alpha=20.0, remat=remat)
        img = jnp.asarray(rng.rand(batch, crop, crop, 3)
                          .astype(np.float32))
        tgt = jnp.asarray((rng.rand(batch, crop, crop, C + O) > 0.5)
                          .astype(np.float32))
        key = jax.random.PRNGKey(1)
        for _ in range(3):
            state, metrics = step(state, img, tgt, key)
        float(metrics["loss"])
        if profile and name.startswith("bf16 b8"):
            jax.profiler.start_trace("/tmp/jaxtrace_train")
        t0 = time.time()
        iters = 10
        for _ in range(iters):
            state, metrics = step(state, img, tgt, key)
        float(metrics["loss"])
        dt = (time.time() - t0) / iters * 1000
        if profile and name.startswith("bf16 b8"):
            jax.profiler.stop_trace()
        # train-step MFU (VERDICT r3 #4): XLA analytic FLOPs (fwd + bwd
        # + optimizer) / time / bf16 MXU peak
        sys.path.insert(0, "/root/repo")
        from bench import _compiled_flops, _peak_flops
        flops = _compiled_flops(step, state, img, tgt, key)
        mfu = ""
        if flops is not None:
            peak, _ = _peak_flops()
            mfu = "  MFU %.1f%% (%.0f GF/step)" % (
                flops / (dt / 1000) / peak * 100, flops / 1e9)
        print("%-42s %7.1f ms  %6.1f img/s%s"
              % (name, dt, batch / dt * 1000, mfu))


if __name__ == "__main__":
    main()
