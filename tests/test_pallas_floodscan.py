"""Pallas flood-scan kernel: bit-equivalence with the jnp scan sweeps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mergenet_tpu.decoder.device import _scan_sweeps


def _run_kernel(h, v, s, t, ccl):
    from jax.experimental.pallas import tpu as pltpu
    from mergenet_tpu.ops.pallas.floodscan import flood_scan
    with pltpu.force_tpu_interpret_mode():
        return np.asarray(flood_scan(h, v, s, t, ccl))


@pytest.mark.parametrize("s,t,ccl", [(1, 1, 3), (2, 1, 3), (1, 2, 2),
                                     (2, 2, 1)])
def test_floodscan_matches_jnp(s, t, ccl):
    H, W = 32, 128
    rng = np.random.RandomState(hash((s, t, ccl)) % 2 ** 31)
    h = jnp.asarray(rng.rand(H, W) < 0.6)
    v = jnp.asarray(rng.rand(H, W) < 0.6)
    label = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    want = np.asarray(_scan_sweeps(label, (h, s), (v, t), ccl))
    got = _run_kernel(h, v, s, t, ccl)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("axis", ["h", "v"])
def test_floodscan_single_axis(axis):
    H, W = 16, 128
    rng = np.random.RandomState(7)
    S = jnp.asarray(rng.rand(H, W) < 0.5)
    label = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    if axis == "h":
        want = np.asarray(_scan_sweeps(label, (S, 1), None, 2))
        got = _run_kernel(S, None, 1, None, 2)
    else:
        want = np.asarray(_scan_sweeps(label, None, (S, 1), 2))
        got = _run_kernel(None, S, None, 1, 2)
    np.testing.assert_array_equal(got, want)


def test_floodscan_dense_links_single_component():
    """All-true links collapse every pixel to label 0 (one component)."""
    H, W = 16, 128
    ones = jnp.ones((H, W), bool)
    got = _run_kernel(ones, ones, 1, 1, 1)
    assert (got == 0).all()


def test_flood_fill_uses_kernel_equivalently():
    """End-to-end _flood_fill is unchanged by the kernel path: compare
    the jnp fallback (forced) against the kernel (interpret mode) on a
    realistic argmax/log-odds scene."""
    from jax.experimental.pallas import tpu as pltpu
    import mergenet_tpu.ops.pallas.floodscan as fs
    from mergenet_tpu.decoder.device import _flood_fill

    H, W = 32, 128
    offsets = ((0, 1), (1, 0), (-2, 3), (4, -1))
    rng = np.random.RandomState(3)
    argmax = jnp.asarray(rng.randint(0, 4, (H, W)).astype(np.int32))
    # plane-major (O, H, W), the _log_domain layout _flood_fill consumes
    lo = jnp.asarray((rng.randn(len(offsets), H, W) * 5)
                     .astype(np.float32))
    args = (argmax, lo, offsets, "sum", jnp.float32(1.0),
            jnp.float32(0.03), 3, 2.0)
    want = np.asarray(_flood_fill(*args))

    orig = fs.flood_scan_supported
    fs.flood_scan_supported = lambda H, W: True
    try:
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(_flood_fill(*args))
    finally:
        fs.flood_scan_supported = orig
    np.testing.assert_array_equal(got, want)
