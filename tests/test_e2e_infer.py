"""In-memory end-to-end inference (net + on-device decode in one jit)."""

import numpy as np

import jax
import jax.numpy as jnp

from mergenet_tpu.models.unet import UNet
from mergenet_tpu.models import init_model
from mergenet_tpu.utils.e2e import build_e2e_infer, masks_to_results


def test_e2e_infer_shapes_and_results():
    num_classes, offsets = 3, ((1, 0), (0, 1))
    model = UNet(num_classes, len(offsets), depth=2, start_filts=8)
    params, bs = init_model(model, jax.random.PRNGKey(0), (1, 32, 32, 3))
    variables = {"params": params, "batch_stats": bs}
    infer = build_e2e_infer(model, num_classes, offsets,
                            decode_size=(16, 16))
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    masks, inst_classes = infer(variables, imgs)
    assert masks.shape == (2, 32, 32)
    assert masks.dtype == jnp.int32
    results = masks_to_results(masks, inst_classes, [100, 101],
                               [0, 11, 12])
    for r in results:
        assert r["image_id"] in (100, 101)
        assert r["category_id"] in (11, 12)
