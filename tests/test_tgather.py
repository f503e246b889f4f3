"""Pallas VMEM table-gather == table[idx] (interpret mode on CPU).

These tests pin the kernel's index math (lane/chunk factoring, tail
padding, packed 31-bit values, out-of-range normalization) where the
default suite runs.  The REAL TPU lowering is gated by
`test_tpu_decode_bit_identity` (tpu-marked): it runs the full
`decode_hierarchical` on a committed native-512x1024 fixture with
MERGENET_TGATHER=0 vs 1 and asserts bit-identical masks — run it on the
bench chip with `MERGENET_TPU_TESTS=1 python -m pytest tests/test_tgather.py
-m tpu` (the verify skill's TPU step).
"""

import os
import pathlib

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


def test_out_of_range_matches_jnp_indexing():
    # the kernel normalizes out-of-range indices exactly like jnp's
    # table[idx]: negative wraps once (i + M), then clamps into [0, M)
    m = 256
    table = jnp.arange(m, dtype=jnp.int32) * 3
    idx = jnp.array([-m - 5, -m, -5, -1, 0, m - 1, m, m + 7, 2 ** 30],
                    dtype=jnp.int32)
    idx = jnp.tile(idx, 16)  # n >= 128 for table_gather_supported
    got = table_gather(table, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(table[idx]))


def test_supported_bounds():
    assert not table_gather_supported(512, 100)      # not lane-aligned
    assert not table_gather_supported(512, 1 << 18)  # beyond VMEM bound
    assert table_gather_supported(512, 1 << 17)


@pytest.mark.tpu
def test_tpu_decode_bit_identity():
    """MERGENET_TGATHER=0 vs 1 through the full serving decode on a
    committed trained-model fixture must be bit-identical on TPU.

    `_tgather` snapshots the env var at TRACE time (see its docstring),
    so the toggle requires clearing the jit caches between runs."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs real TPU (MERGENET_TPU_TESTS=1)")
    from mergenet_tpu.decoder.device import decode_hierarchical, \
        relabel_mask

    fdir = pathlib.Path(__file__).parent / "fixtures" / "certification512"
    probs = np.load(fdir / "probs_0.npz")
    offsets = tuple(map(tuple, np.load(fdir / "offsets.npy").tolist()))
    cp = jnp.asarray(probs["cp"], jnp.float32)
    sp = jnp.asarray(probs["sp"], jnp.float32)

    results = {}
    for toggle in ("1", "0"):
        os.environ["MERGENET_TGATHER"] = toggle
        jax.clear_caches()
        label, root_class, is_inst = decode_hierarchical(
            cp, sp, cp.shape[-1], offsets,
            object_merge_factor=1.0, merge_logprob_bias=0.03)
        mask, inst_class = relabel_mask(label, root_class, is_inst)
        results[toggle] = (np.asarray(mask), np.asarray(inst_class))
    os.environ.pop("MERGENET_TGATHER", None)
    jax.clear_caches()
    np.testing.assert_array_equal(results["1"][0], results["0"][0])
    np.testing.assert_array_equal(results["1"][1], results["0"][1])
