"""Sharded training-step tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mergenet_tpu.models import get_model
from mergenet_tpu.parallel import (
    make_mesh, batch_sharding, make_optimizer, create_train_state,
    build_train_step, build_eval_step, multistep_lr)
from mergenet_tpu.parallel.mesh import shard_batch


def test_mesh_axes():
    mesh = make_mesh()
    assert mesh.shape["data"] == len(jax.devices())
    mesh = make_mesh(spatial=2)
    assert mesh.shape["data"] * 2 == len(jax.devices())


def test_data_axis_for_batch():
    from mergenet_tpu.parallel import data_axis_for_batch
    assert data_axis_for_batch(16, 8) == 8
    assert data_axis_for_batch(2, 8) == 2   # toy batch -> dp2 sub-mesh
    assert data_axis_for_batch(6, 8) == 6
    assert data_axis_for_batch(7, 4) == 1   # prime batch: no sharding
    assert data_axis_for_batch(8, 1) == 1


def test_validate_pads_partial_batches_on_mesh():
    """A 3-sample val set at batch 2 leaves a partial final batch; with
    pad_to = mesh data size the sharded eval step still runs and the
    score metrics cover the real rows only (recipe divisibility fix)."""
    from mergenet_tpu.parallel import data_axis_for_batch
    from mergenet_tpu.utils.train_utils import validate

    dp = data_axis_for_batch(2)
    assert dp == 2
    mesh = make_mesh(data=dp, devices=jax.devices()[:dp])
    _, state, _ = _tiny_setup()
    eval_step = build_eval_step(3, 2, alpha=1.0, mesh=mesh)
    rs = np.random.RandomState(0)
    imgs = rs.rand(3, 16, 16, 3).astype(np.float32)
    targets = (rs.rand(3, 16, 16, 5) > 0.5).astype(np.float32)
    batches = [(imgs[:2], targets[:2]), (imgs[2:], targets[2:])]
    val = validate(batches, state, eval_step, 2, 0, 0, num_classes=3,
                   offset_list=[(1, 0), (0, 1)], score=True, pad_to=dp)
    assert np.isfinite(val)


def test_multistep_lr():
    sched = multistep_lr(0.1, [2, 4], gamma=0.1, steps_per_epoch=10)
    assert np.isclose(sched(0), 0.1)
    assert np.isclose(sched(25), 0.01)
    assert np.isclose(sched(45), 0.001)


def _tiny_setup(mesh=None):
    model = get_model(3, 2, "unet", axis_name=None)
    # tiny UNet stand-in: use depth-2 version for speed
    from mergenet_tpu.models.unet import UNet
    model = UNet(3, 2, depth=2, start_filts=8)
    tx = make_optimizer(lr=0.05, milestones=[100])
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               (1, 16, 16, 3))
    step = build_train_step(3, 2, alpha=1.0, mesh=mesh)
    return model, state, step


def test_train_step_decreases_loss():
    _, state, step = _tiny_setup()
    rng = jax.random.PRNGKey(1)
    img = jax.random.uniform(rng, (4, 16, 16, 3))
    target = (jax.random.uniform(jax.random.PRNGKey(2),
                                 (4, 16, 16, 5)) > 0.5).astype(jnp.float32)
    losses = []
    for i in range(8):
        state, metrics = step(state, img, target, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_train_step_sharded_matches_unsharded():
    """The pjit'd step over an 8-device mesh produces the same loss
    trajectory as single-device execution (SPMD is semantics-preserving)."""
    mesh = make_mesh()
    _, state_a, step_plain = _tiny_setup()
    _, state_b, step_mesh = _tiny_setup(mesh=mesh)

    img = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3))
    target = (jax.random.uniform(jax.random.PRNGKey(2),
                                 (8, 16, 16, 5)) > 0.5).astype(jnp.float32)
    img_sh = jax.device_put(img, batch_sharding(mesh, spatial_axis=None))
    tgt_sh = jax.device_put(target, batch_sharding(mesh, spatial_axis=None))

    for i in range(3):
        rng = jax.random.PRNGKey(i)
        state_a, ma = step_plain(state_a, img, target, rng)
        state_b, mb = step_mesh(state_b, img_sh, tgt_sh, rng)
        np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                                   rtol=2e-5)


def test_eval_step():
    _, state, _ = _tiny_setup()
    eval_step = build_eval_step(3, 2)
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    target = jnp.zeros((2, 16, 16, 5))
    probs, metrics = eval_step(state, img, target)
    assert probs.shape == (2, 16, 16, 5)
    assert float(probs.min()) >= 0 and float(probs.max()) <= 1
    assert np.isfinite(float(metrics["loss"]))


def test_eval_step_per_sample_metrics():
    """The per-sample vectors let validate() aggregate over real rows only
    when partial batches are padded: shape (B,), and their mean recovers
    the batch-mean scalar (the criterion is a mean over elements of
    identically-shaped rows)."""
    _, state, _ = _tiny_setup()
    eval_step = build_eval_step(3, 2)
    img = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 3))
    target = (jax.random.uniform(jax.random.PRNGKey(2),
                                 (4, 16, 16, 5)) > 0.5).astype(jnp.float32)
    _, metrics = eval_step(state, img, target)
    for key, scalar in (("per_sample_loss", "loss"),
                        ("per_sample_cls", "cls_loss"),
                        ("per_sample_ofs", "ofs_loss")):
        vec = np.asarray(metrics[key])
        assert vec.shape == (4,)
        np.testing.assert_allclose(vec.mean(), float(metrics[scalar]),
                                   rtol=1e-5)
    # a padded duplicate of the last row must not change the
    # real-rows-only aggregate that validate() computes
    img_pad = jnp.concatenate([img, img[-1:]])
    tgt_pad = jnp.concatenate([target, target[-1:]])
    _, mp = eval_step(state, img_pad, tgt_pad)
    np.testing.assert_allclose(
        np.asarray(mp["per_sample_loss"])[:4].mean(),
        float(metrics["loss"]), rtol=1e-5)


def test_spatial_sharding_compiles():
    """Conv forward with the batch sharded over both data and spatial axes:
    GSPMD inserts halo exchanges automatically."""
    mesh = make_mesh(data=4, spatial=2)
    _, state, step = _tiny_setup(mesh=mesh)
    img = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 3))
    target = (jax.random.uniform(jax.random.PRNGKey(2),
                                 (4, 16, 16, 5)) > 0.5).astype(jnp.float32)
    sh = batch_sharding(mesh, spatial_axis=1)
    img = jax.device_put(img, sh)
    target = jax.device_put(target, sh)
    state, metrics = step(state, img, target, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_remat_train_step_matches():
    """jax.checkpoint'd step produces the same updates (it only changes
    the memory/compute tradeoff)."""
    _, state_a, _ = _tiny_setup()
    _, state_b, _ = _tiny_setup()
    step_plain = build_train_step(3, 2)
    step_remat = build_train_step(3, 2, remat=True)
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    tgt = (jax.random.uniform(jax.random.PRNGKey(2),
                              (2, 16, 16, 5)) > 0.5).astype(jnp.float32)
    for i in range(2):
        rng = jax.random.PRNGKey(i)
        state_a, ma = step_plain(state_a, img, tgt, rng)
        state_b, mb = step_remat(state_b, img, tgt, rng)
        np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                                   rtol=1e-6)
