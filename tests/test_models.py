"""Model zoo smoke tests: forward shapes, gradient flow, factory grammar."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mergenet_tpu.models import (get_model, init_model, param_count,
                                 VALID_ARCHS, tile_predict)


def _forward(model, x, train=False, rng=None, **kwargs):
    rng = rng or jax.random.PRNGKey(0)
    params, batch_stats = init_model(model, rng, x.shape, train=False)
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, _ = model.apply(variables, x, train=True,
                             rngs={"dropout": rng},
                             mutable=["batch_stats"], **kwargs)
        return out
    return model.apply(variables, x, train=False, **kwargs)


def test_factory_rejects_unknown():
    with pytest.raises(ValueError):
        get_model(3, 2, "resnext1000")


def test_factory_kwargs_passthrough():
    """Extra kwargs reach the arch constructor (e.g. ref_head=True for
    reference FCN-VGG16 checkpoint geometry, models/fcn.py)."""
    model = get_model(3, 2, "fcn8_vgg16", ref_head=True, verbose=False)
    assert model.ref_head is True
    with pytest.raises(TypeError):
        get_model(3, 2, "unet", ref_head=True, verbose=False)


@pytest.mark.parametrize("arch", ["unet", "fcn16_resnet18", "fcn8_vgg16"])
def test_forward_shapes_small(arch):
    model = get_model(3, 2, arch)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out = _forward(model, x)
    assert out.shape == (1, 64, 64, 5)


def test_pspfpnet_forward():
    model = get_model(3, 2, "pspfpnet")
    # 96 = divisible by 32 and by PPM pool sizes at /32 (3x3 grid)
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    out = _forward(model, x)
    assert out.shape == (1, 96, 96, 5)


def test_upernet_forward():
    model = get_model(3, 2, "upernet")
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    out = _forward(model, x)
    assert out.shape == (1, 96, 96, 5)


def test_pspnet_forward_and_aux():
    model = get_model(3, 2, "pspnet")
    x = jnp.zeros((1, 48, 48, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    params, batch_stats = init_model(model, rng, x.shape)
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      x, train=False)
    assert out.shape == (1, 48, 48, 5)
    out, aux = model.apply({"params": params, "batch_stats": batch_stats},
                           x, train=False, with_aux=True)
    assert aux.shape == (1, 48, 48, 5)


def test_unet_train_grad():
    """Forward + backward on random input (reference Unet.py:227-236)."""
    model = get_model(3, 2, "unet", axis_name=None)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 32, 32, 3))
    params, batch_stats = init_model(model, rng, x.shape)

    def loss_fn(p):
        out, updates = model.apply(
            {"params": p, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"])
        return jnp.sum(out)

    grads = jax.grad(loss_fn)(params)
    norms = [float(jnp.abs(g).max())
             for g in jax.tree_util.tree_leaves(grads)]
    assert any(n > 0 for n in norms)


def test_param_count_positive():
    model = get_model(3, 2, "unet")
    params, _ = init_model(model, jax.random.PRNGKey(0), (1, 32, 32, 3))
    assert param_count(params) > 1_000_000  # UNet depth5 is ~31M


def test_valid_archs_cover_reference():
    # parity with reference models/__init__.py:10-16
    assert "fcn8_resnet152" in VALID_ARCHS
    assert "fcn32_vgg16" in VALID_ARCHS
    assert {"unet", "pspnet", "pspfpnet", "upernet"} <= set(VALID_ARCHS)


def test_tile_predict_shapes_and_normalization():
    C = 4

    def fake_apply(x):
        # deterministic "model": logits from the image mean
        return jnp.tile(x.mean(axis=-1, keepdims=True), (1, 1, 1, C))

    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 40, 56, 3)
                       .astype(np.float32))
    probs = tile_predict(fake_apply, imgs, C, (16, 16))
    assert probs.shape == (2, 40, 56, C)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)


def test_tile_predict_class_remap():
    """background = max over non-instance channels, instances copied
    (reference pspnet_caffe.py:548-554)."""
    n_model, n_inst = 6, 3

    def fake_apply(x):
        n = x.shape[0]
        logits = jnp.zeros((n, x.shape[1], x.shape[2], n_model))
        return logits.at[..., 1].set(3.0)  # one dominant non-instance class

    imgs = jnp.zeros((1, 16, 16, 3), jnp.float32)
    probs = tile_predict(fake_apply, imgs, n_inst, (8, 8),
                         n_model_classes=n_model, include_flip_mode=False)
    assert probs.shape == (1, 16, 16, n_inst)
    # channel 0 (background) should dominate after the remap
    assert np.asarray(probs[..., 0]).min() > 0.5


@pytest.mark.parametrize("in_shape,out_size", [
    ((2, 8, 16, 5), (16, 32)),     # exact 2x
    ((1, 8, 16, 3), (24, 40)),     # non-integer factors
    ((1, 1, 1, 4), (6, 10)),       # degenerate 1x1 input
    ((1, 7, 9, 2), (7, 9)),        # identity
    ((2, 8, 12, 3), (8, 30)),      # one axis only
])
def test_resize_bilinear_matches_jax_image(in_shape, out_size):
    """The separable-matmul upsampling path reproduces
    jax.image.resize('bilinear') half-pixel triangle weights (incl. the
    normalize-over-valid-samples boundary rule) to float tolerance."""
    from mergenet_tpu.models.layers import resize_bilinear
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(*in_shape).astype(np.float32))
    got = np.asarray(resize_bilinear(x, out_size))
    want = np.asarray(jax.image.resize(
        x, (in_shape[0],) + tuple(out_size) + (in_shape[-1],),
        method="bilinear"))
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)
    # rank-3 HWC path
    got3 = np.asarray(resize_bilinear(x[0], out_size))
    np.testing.assert_allclose(got3, want[0], atol=2e-6, rtol=1e-5)


def test_resize_bilinear_bf16_path():
    """bf16 inputs take the reduced-precision matmul path: output dtype
    preserved, values within bf16 tolerance of the f32 reference."""
    from mergenet_tpu.models.layers import resize_bilinear
    x32 = jnp.asarray(np.random.RandomState(2)
                      .rand(1, 16, 24, 8).astype(np.float32))
    got = resize_bilinear(x32.astype(jnp.bfloat16), (40, 60))
    assert got.dtype == jnp.bfloat16
    want = np.asarray(resize_bilinear(x32, (40, 60)))
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=0.02, rtol=0.02)


def test_s2d_stem_exact():
    """StemConv7's space-to-depth rewrite computes the SAME conv as the
    strided 7x7 on identical params (summation-order float tolerance),
    and the param tree is unchanged (Conv_0/kernel, (7,7,3,64))."""
    from mergenet_tpu.models.layers import StemConv7
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(1, 32, 48, 3).astype(np.float32))
    base = StemConv7(features=64, s2d=False)
    v = base.init(jax.random.PRNGKey(0), x)
    assert v["params"]["kernel"].shape == (7, 7, 3, 64)
    want = np.asarray(base.apply(v, x))
    got = np.asarray(StemConv7(features=64, s2d=True).apply(v, x))
    assert got.shape == want.shape == (1, 16, 24, 64)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    # odd spatial size falls back to the strided conv
    xo = x[:, :31, :47, :]
    np.testing.assert_allclose(
        np.asarray(StemConv7(features=64, s2d=True).apply(v, xo)),
        np.asarray(base.apply(v, xo)), atol=1e-6)


def test_s2d_stem_model_parity():
    """PSPFPNet(s2d_stem=True) shares the baseline's param/stat trees and
    reproduces its forward on identical variables."""
    from mergenet_tpu.models import init_model
    from mergenet_tpu.models.pspnet import PSPFPNet
    x = jnp.asarray(np.random.RandomState(1)
                    .rand(1, 64, 96, 3).astype(np.float32))
    m0 = PSPFPNet(7, layer=18, fpn_dim=32)
    params, stats = init_model(m0, jax.random.PRNGKey(0), (1, 64, 96, 3))
    v = {"params": params, "batch_stats": stats}
    m1 = m0.clone(s2d_stem=True)
    want = np.asarray(m0.apply(v, x, train=False))
    got = np.asarray(m1.apply(v, x, train=False))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_concat_fusion_conv_matches_concat_conv():
    """ConcatFusionConv == nn.Conv(3x3, SAME) over the channel concat on
    the SAME params (summed-partial-conv float tolerance), with the
    identical param tree (kernel (3,3,sum(ci),F) + bias) so checkpoints
    and the weight importer are unchanged."""
    import flax.linen as nn
    from mergenet_tpu.models.layers import ConcatFusionConv
    rnd = np.random.RandomState(0)
    parts = [jnp.asarray(rnd.rand(2, 8, 12, c).astype(np.float32))
             for c in (5, 3, 5, 7)]
    xcat = jnp.concatenate(parts, axis=-1)
    ref = nn.Conv(6, (3, 3), padding="SAME")
    v = ref.init(jax.random.PRNGKey(0), xcat)
    assert v["params"]["kernel"].shape == (3, 3, 20, 6)
    fused = ConcatFusionConv(6)
    got = np.asarray(fused.apply(v, parts))
    want = np.asarray(ref.apply(v, xcat))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    # init produces the same tree shapes as the conv it replaces
    v2 = fused.init(jax.random.PRNGKey(1), parts)
    assert v2["params"]["kernel"].shape == (3, 3, 20, 6)
    assert v2["params"]["bias"].shape == (6,)
    # bf16 compute path matches the bf16 conv
    vb = jax.tree_util.tree_map(lambda a: a, v)
    got_bf = np.asarray(ConcatFusionConv(6, dtype=jnp.bfloat16)
                        .apply(vb, parts).astype(jnp.float32))
    want_bf = np.asarray(nn.Conv(6, (3, 3), padding="SAME",
                                 dtype=jnp.bfloat16)
                         .apply(vb, xcat).astype(jnp.float32))
    np.testing.assert_allclose(got_bf, want_bf, atol=2e-2, rtol=2e-2)


def test_resize_bilinear_downsample_falls_back():
    from mergenet_tpu.models.layers import resize_bilinear
    x = jnp.asarray(np.random.RandomState(1).rand(1, 16, 16, 2)
                    .astype(np.float32))
    got = np.asarray(resize_bilinear(x, (8, 8)))
    want = np.asarray(jax.image.resize(x, (1, 8, 8, 2), method="bilinear"))
    np.testing.assert_allclose(got, want, atol=1e-6)
