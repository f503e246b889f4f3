"""from_logits decode fast path: algebraic collapse of the sigmoid ->
clip -> log round trip (`decoder/device.py::_log_domain`).

Serving/e2e feed the net's raw logits straight into
`decode_hierarchical(from_logits=True)`; these tests pin (1) numeric
agreement of the collapsed log-domain with the probability path, (2)
mask identity through the FULL decode on a committed trained fixture,
and (3) the e2e builder's automatic fallback to `probs_at` for models
without `output_size` support.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mergenet_tpu.decoder.device import (_log_domain, decode_hierarchical)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "certification")


def _logit(p):
    # f64 host-side inverse sigmoid so the synthesized logits carry no
    # extra rounding beyond the fixtures' own f16 quantization
    p = np.clip(np.asarray(p, np.float64), 1e-12, 1 - 1e-12)
    return (np.log(p) - np.log1p(-p)).astype(np.float32)


@pytest.mark.parametrize("bias", [0.0, 0.7])
def test_log_domain_from_logits_matches_probs_path(bias):
    rng = np.random.RandomState(0)
    cp = rng.rand(8, 16, 5).astype(np.float32)
    sp = rng.rand(8, 16, 3).astype(np.float32)
    # include saturated probabilities (the clip region on both paths)
    cp[0, :4] = 1e-9
    cp[1, :4] = 1.0 - 1e-9
    sp[0, :4] = 1e-9
    sp[1, :4] = 1.0 - 1e-9
    a_cls, a_lo = _log_domain(jnp.asarray(cp), jnp.asarray(sp), bias)
    b_cls, b_lo = _log_domain(jnp.asarray(_logit(cp)),
                              jnp.asarray(_logit(sp)), bias,
                              from_logits=True)
    # tolerance bounds the probs path's f32 sigmoid -> log ROUND-TRIP
    # error (log1p cancellation near saturation, measured 4.8e-4 at
    # sp=0.9998); the collapsed path is the more accurate of the two
    np.testing.assert_allclose(np.asarray(a_cls), np.asarray(b_cls),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(a_lo), np.asarray(b_lo),
                               rtol=1e-4, atol=1e-3)


def test_decode_from_logits_mask_identity_on_trained_fixture():
    d = np.load(os.path.join(FIX, "probs_0.npz"))
    offsets = tuple(tuple(int(x) for x in o)
                    for o in np.load(os.path.join(FIX, "offsets.npy")))
    cp = d["cp"].astype(np.float32)
    sp = d["sp"].astype(np.float32)
    kw = dict(object_merge_factor=1.0, merge_logprob_bias=0.03,
              relabel=True)
    m_p, ic_p = decode_hierarchical(jnp.asarray(cp), jnp.asarray(sp),
                                    cp.shape[-1], offsets, **kw)
    m_l, ic_l = decode_hierarchical(jnp.asarray(_logit(cp)),
                                    jnp.asarray(_logit(sp)),
                                    cp.shape[-1], offsets,
                                    from_logits=True, **kw)
    assert np.array_equal(np.asarray(m_p), np.asarray(m_l))
    assert np.array_equal(np.asarray(ic_p), np.asarray(ic_l))


def test_e2e_builder_falls_back_without_output_size():
    from mergenet_tpu.models import init_model, logits_at
    from mergenet_tpu.models.unet import UNet
    from mergenet_tpu.utils.e2e import build_e2e_infer
    model = UNet(3, 2, depth=2, start_filts=8)
    params, bs = init_model(model, jax.random.PRNGKey(0), (1, 32, 32, 3))
    variables = {"params": params, "batch_stats": bs}
    assert logits_at(model, variables,
                     jnp.zeros((1, 32, 32, 3)), (16, 16)) is None
    offsets = ((1, 0), (0, 1))
    infer = build_e2e_infer(model, 3, offsets, decode_size=(16, 16))
    masks, ic = infer(variables, jnp.zeros((1, 32, 32, 3)))
    assert masks.shape == (1, 32, 32)
