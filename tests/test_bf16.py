"""Mixed-precision (bf16 compute, f32 params) model path."""

import numpy as np

import jax
import jax.numpy as jnp

from mergenet_tpu.models import get_model, init_model
from mergenet_tpu.models.unet import UNet
from mergenet_tpu.parallel import (make_optimizer, create_train_state,
                                   build_train_step)


def test_bf16_forward_close_to_f32():
    m32 = UNet(3, 2, depth=2, start_filts=8)
    m16 = UNet(3, 2, depth=2, start_filts=8, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, 16, 16, 3))
    params, bs = init_model(m32, rng, x.shape)
    # params are float32 in both (param_dtype default)
    y32 = m32.apply({"params": params, "batch_stats": bs}, x, train=False)
    y16 = m16.apply({"params": params, "batch_stats": bs}, x, train=False)
    assert y16.dtype == jnp.float32  # logits cast back
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32),
                               atol=0.15, rtol=0.1)


def test_bf16_training_learns():
    model = UNet(2, 1, depth=2, start_filts=8, dtype=jnp.bfloat16)
    tx = make_optimizer(lr=0.05)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               (1, 16, 16, 3))
    # params stay float32
    dtypes = {str(x.dtype) for x in
              jax.tree_util.tree_leaves(state.params)}
    assert dtypes == {"float32"}
    step = build_train_step(2, 1)
    img = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 3))
    tgt = (jax.random.uniform(jax.random.PRNGKey(2),
                              (4, 16, 16, 3)) > 0.5).astype(jnp.float32)
    losses = []
    for i in range(6):
        state, m = step(state, img, tgt, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_factory_dtype_passthrough():
    m = get_model(3, 2, "pspfpnet", dtype=jnp.bfloat16)
    assert m.dtype == jnp.bfloat16
