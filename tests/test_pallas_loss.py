"""Pallas fused-loss kernel: value + gradient parity with the reference
composition of BCE losses (runs in interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mergenet_tpu.ops.losses import fused_class_offset_loss
from mergenet_tpu.ops.pallas import fused_class_offset_bce


def _data(shape=(2, 16, 24, 7), seed=0):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(*shape).astype(np.float32))
    targets = jnp.asarray((rng.rand(*shape) > 0.5).astype(np.float32))
    return logits, targets


@pytest.mark.parametrize("alpha", [1.0, 20.0])
def test_forward_matches_composition(alpha):
    logits, targets = _data()
    ref, _ = fused_class_offset_loss(logits, targets, 3, alpha=alpha)
    got = fused_class_offset_bce(logits, targets, 3, alpha)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_grad_matches_composition():
    logits, targets = _data(shape=(1, 8, 16, 5))

    def ref_fn(lg):
        total, _ = fused_class_offset_loss(lg, targets, 2, alpha=3.0)
        return total

    def pal_fn(lg):
        return fused_class_offset_bce(lg, targets, 2, 3.0)

    g_ref = jax.grad(ref_fn)(logits)
    g_pal = jax.grad(pal_fn)(logits)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_nonaligned_sizes():
    # total element count deliberately not a multiple of the block
    logits, targets = _data(shape=(1, 13, 11, 6))
    ref, _ = fused_class_offset_loss(logits, targets, 4, alpha=2.0)
    got = fused_class_offset_bce(logits, targets, 4, 2.0)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
