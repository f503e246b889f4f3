"""Pallas VMEM table-gather == table[idx] (interpret mode on CPU).

The TPU lowering is additionally verified bit-identical through the
full `decode_hierarchical` on the committed native-512x1024 fixtures
(MERGENET_TGATHER=0 vs 1 — see ops/pallas/tgather.py and the
docs/benchmarks.md round-3 entry); this test pins the kernel's index
math (lane/chunk factoring, tail padding, packed 31-bit values) where
the default suite runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mergenet_tpu.ops.pallas.tgather import (table_gather,
                                             table_gather_supported)


@pytest.mark.parametrize("m", [128, 8192, 65536])
@pytest.mark.parametrize("n", [128, 1000, 512 * 128 + 37])
def test_matches_xla_gather(m, n):
    assert table_gather_supported(n, m)
    kt, ki = jax.random.split(jax.random.PRNGKey(m + n))
    table = jax.random.randint(kt, (m,), 0, m, dtype=jnp.int32)
    idx = jax.random.randint(ki, (n,), 0, m, dtype=jnp.int32)
    got = table_gather(table, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(table)[np.asarray(idx)])


def test_packed_31bit_values_and_shape():
    # decoder stage-2 packs (size << 5 | argcls << 1 | frozen) into int32;
    # values must pass through exactly, and 2-D index shapes round-trip
    m = 1024
    kt, ki = jax.random.split(jax.random.PRNGKey(0))
    table = jax.random.randint(kt, (m,), -(2 ** 31), 2 ** 31 - 1,
                               dtype=jnp.int32)
    idx = jax.random.randint(ki, (48, 96), 0, m, dtype=jnp.int32)
    got = table_gather(table, idx, interpret=True)
    assert got.shape == idx.shape
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(table)[np.asarray(idx)])


def test_supported_bounds():
    assert not table_gather_supported(512, 100)      # not lane-aligned
    assert not table_gather_supported(512, 1 << 18)  # beyond VMEM bound
    assert table_gather_supported(512, 1 << 17)
