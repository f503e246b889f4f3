"""Pallas absorption-scan kernel: bit-equivalence with the jnp path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mergenet_tpu.decoder import device as D


def _jnp_reference(comp2d, packed_own, log_odds, offsets, theta,
                   size_cap):
    """The decode_hierarchical stage-2 plane loop, extracted verbatim."""
    H, W = comp2d.shape
    arg_own = (packed_own >> 1) & 15
    size_own = packed_own >> 5
    froz_own = (packed_own & 1) == 1
    best_pri = jnp.full((H, W), D.NEG_INF, jnp.float32)
    best_partner = jnp.full((H, W), -1, jnp.int32)
    for oi, (di, dj) in enumerate(offsets):
        nbr = D._shift2d(comp2d, di, dj, -1)
        arg_nbr = D._shift2d(arg_own, di, dj, -2)
        size_nbr = D._shift2d(size_own, di, dj, 0)
        froz_nbr = D._shift2d(froz_own, di, dj, True)
        oml = log_odds[:, :, oi]
        ok = ((nbr >= 0) & (nbr != comp2d) & (arg_nbr == arg_own) &
              (jnp.minimum(size_own, size_nbr) <= size_cap) &
              (oml >= theta) & ~froz_own & ~froz_nbr)
        up = (size_nbr > size_own) | ((size_nbr == size_own) &
                                      (nbr > comp2d))
        pri_f = jnp.where(ok & up, oml, D.NEG_INF)
        pri_b = jnp.where(ok & ~up, oml, D.NEG_INF)
        for p, q in ((pri_f, nbr),
                     (D._shift2d(pri_b, -di, -dj, D.NEG_INF),
                      D._shift2d(comp2d, -di, -dj, -1))):
            take = (p > best_pri) | ((p == best_pri) & (q > best_partner))
            best_pri = jnp.where(take, p, best_pri)
            best_partner = jnp.where(take, q, best_partner)
    return best_pri, best_partner


def test_absorb_kernel_matches_jnp_path():
    from jax.experimental.pallas import tpu as pltpu
    from mergenet_tpu.ops.pallas.absorb import absorb_best_edges

    H, W = 32, 256
    offsets = ((0, 2), (2, 0), (-2, -1), (3, 5), (-4, 3))
    rng = np.random.RandomState(0)
    comp = jnp.asarray(rng.randint(0, 50, (H, W)).astype(np.int32))
    size = rng.randint(1, 200, (H, W)).astype(np.int32)
    argc = rng.randint(0, 5, (H, W)).astype(np.int32)
    froz = (rng.rand(H, W) < 0.05).astype(np.int32)
    packed = jnp.asarray((size << 5) | (argc << 1) | froz)
    lo = jnp.asarray(rng.randn(H, W, len(offsets)).astype(np.float32) * 4)

    ref_pri, ref_partner = _jnp_reference(comp, packed, lo, offsets,
                                          1.5, 64)
    with pltpu.force_tpu_interpret_mode():
        got_pri, got_partner = absorb_best_edges(
            comp, packed, jnp.moveaxis(lo, -1, 0), offsets, 1.5, 64)
    np.testing.assert_array_equal(np.asarray(got_pri),
                                  np.asarray(ref_pri))
    np.testing.assert_array_equal(np.asarray(got_partner),
                                  np.asarray(ref_partner))
