#!/usr/bin/env python3
"""End-to-end benchmark: Cityscapes-style net forward (PSPFPNet-r50 at
1024x2048) + on-device merge decode (at the reference's 512x1024 decode
size), frames/sec on the attached TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "fps", "vs_baseline": N}

vs_baseline is against the BASELINE.json target of 30 fps on a v5e-8 slice,
scaled to the number of attached chips (i.e. target_per_chip = 30/8 * n).
The reference publishes no numbers; its own host decoder measures ~43 s per
512x1024 frame on this machine's CPU (see BASELINE.md), so fps here is
net+decode throughput, the signature workload.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from mergenet_tpu.models import get_model, init_model
    from mergenet_tpu.core import generate_offsets
    from mergenet_tpu.decoder.device import decode_on_device, relabel_mask

    num_classes, num_offsets = 9, 10
    offsets = tuple(generate_offsets(40, num_offsets))
    H, W = 1024, 2048           # full-res input
    DH, DW = 512, 1024          # decode size (reference segment.py:93)

    model = get_model(num_classes, num_offsets, "pspfpnet")
    rng = jax.random.PRNGKey(0)
    params, batch_stats = init_model(model, rng, (1, 256, 256, 3))
    variables = {"params": params, "batch_stats": batch_stats}
    # bf16 inference: weights + activations on the MXU in bf16, decode f32
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, variables)

    @jax.jit
    def forward_and_decode(variables, x):
        logits = model.apply(variables, x.astype(jnp.bfloat16),
                             train=False).astype(jnp.float32)
        probs = jax.nn.sigmoid(logits)
        # decode at reduced size (reference decodes at 512x1024 and
        # upsamples the mask)
        small = jax.image.resize(
            probs, (probs.shape[0], DH, DW, probs.shape[-1]), "bilinear")
        cp = small[0, :, :, :num_classes]
        sp = small[0, :, :, num_classes:]
        label, root_class, is_inst = decode_on_device(
            cp, sp, num_classes, offsets, object_merge_factor=1.0,
            merge_logprob_bias=0.03, max_rounds=48,
            max_components=DH * DW // 8, max_edges=DH * DW // 2)
        mask, inst_class = relabel_mask(label, root_class, is_inst)
        return mask, inst_class

    # synthetic street-like scene so the decode does real work
    rs = np.random.RandomState(0)
    img = rs.rand(1, H, W, 3).astype(np.float32)
    x = jnp.asarray(img)

    # warmup / compile
    mask, inst_class = forward_and_decode(variables, x)
    np.asarray(mask)

    n_iters = 5
    t0 = time.time()
    for _ in range(n_iters):
        mask, inst_class = forward_and_decode(variables, x)
    np.asarray(mask)
    dt = (time.time() - t0) / n_iters
    fps = 1.0 / dt

    n_chips = len(jax.devices())
    target = 30.0 / 8.0 * n_chips
    print(json.dumps({
        "metric": "cityscapes_1024x2048_net_plus_merge_fps",
        "value": round(fps, 4),
        "unit": "frames/sec",
        "vs_baseline": round(fps / target, 4),
    }))


if __name__ == "__main__":
    main()
