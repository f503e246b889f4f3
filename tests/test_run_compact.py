"""Run-compacted densify/stats (decoder/device.py::_densify_stats_runs).

The fast path replaces the (N, C+1) scatter-lowered segment_sum and the
N-sized dense[flat] gather with column-run-granular work; it must match
the scatter path exactly on ids/sizes and to f32 summation-order
tolerance on the class-logprob sums, and `_densify_stats` must fall
back to the scatter path (via lax.cond) when the grid exceeds
RUN_SLOTS column runs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mergenet_tpu.decoder import device as D


def _blocky_labels(rng, H, W, n_blobs=24):
    """Self-rooted root-pixel labels with contiguous regions (the
    _densify_stats input contract)."""
    lab = np.zeros((H, W), np.int32)
    owner = np.zeros((H, W), bool)
    for _ in range(n_blobs):
        r, c = rng.randint(0, H - 4), rng.randint(0, W - 4)
        h, w = rng.randint(3, max(4, H // 3)), rng.randint(3, max(4, W // 3))
        sl = (slice(r, min(r + h, H)), slice(c, min(c + w, W)))
        lab[sl] = r * W + c
        owner[sl] = False
    # root-pixel property: each region's label must be a pixel INSIDE it
    # pointing to itself; rebuild roots as each region's min flat index
    flat = lab.reshape(-1)
    uniq, inv = np.unique(flat, return_inverse=True)
    mins = np.full(len(uniq), np.iinfo(np.int32).max, np.int64)
    np.minimum.at(mins, inv, np.arange(H * W))
    flat = mins[inv].astype(np.int32)
    return flat.reshape(H, W)


def _slow_reference(label, cls_lp_pix, M):
    H, W = label.shape
    C = cls_lp_pix.shape[-1]
    N = H * W
    flat = label.reshape(-1)
    is_rep = (flat == np.arange(N)).astype(np.int64)
    dense = np.cumsum(is_rep) - 1
    comp = np.minimum(dense[flat], M - 1)
    agg = np.zeros((M, C + 1), np.float64)
    np.add.at(agg, comp, np.concatenate(
        [cls_lp_pix.reshape(N, C), np.ones((N, 1))], axis=1))
    return (comp.reshape(H, W).astype(np.int32), agg[:, :C],
            agg[:, C].astype(np.int32), int(dense[-1] + 1))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_runs_path_matches_scatter_path(seed):
    rng = np.random.RandomState(seed)
    H, W, C, M = 96, 128, 5, 4096
    label = _blocky_labels(rng, H, W)
    cls_lp = -rng.rand(H, W, C).astype(np.float32) * 12.0

    comp_r, lp_r, size_r, froz_r, ntot_r, n_runs, runs = jax.jit(
        D._densify_stats_runs, static_argnums=(2,))(
            jnp.asarray(label), jnp.asarray(cls_lp), M)
    assert int(n_runs) <= D.RUN_SLOTS
    assert bool(runs[3])

    comp_e, lp_e, size_e, ntot_e = _slow_reference(label, cls_lp, M)
    np.testing.assert_array_equal(np.asarray(comp_r), comp_e)
    np.testing.assert_array_equal(np.asarray(size_r), size_e)
    assert int(ntot_r) == ntot_e
    np.testing.assert_allclose(np.asarray(lp_r), lp_e,
                               rtol=1e-5, atol=1e-3)
    assert not bool(np.asarray(froz_r).any())


def test_densify_stats_dispatch_matches_on_blocky():
    rng = np.random.RandomState(7)
    H, W, C, M = 64, 256, 3, 2048
    label = _blocky_labels(rng, H, W)
    cls_lp = -rng.rand(H, W, C).astype(np.float32) * 8.0
    comp, lp, size, froz, ntot = jax.jit(
        D._densify_stats, static_argnums=(2,))(
            jnp.asarray(label), jnp.asarray(cls_lp), M)
    comp_e, lp_e, size_e, ntot_e = _slow_reference(label, cls_lp, M)
    np.testing.assert_array_equal(np.asarray(comp), comp_e)
    np.testing.assert_array_equal(np.asarray(size), size_e)
    np.testing.assert_allclose(np.asarray(lp), lp_e,
                               rtol=1e-5, atol=1e-3)
    assert int(ntot) == ntot_e


@pytest.mark.parametrize("seed", [0, 3])
def test_run_apply_and_segment_max_match_pixel_ops(seed):
    rng = np.random.RandomState(seed)
    H, W, C, M = 96, 128, 4, 2048
    label = _blocky_labels(rng, H, W)
    cls_lp = -rng.rand(H, W, C).astype(np.float32)
    comp, _, _, _, _, runs = jax.jit(
        D._densify_stats, static_argnums=(2,),
        static_argnames=("return_runs",))(
            jnp.asarray(label), jnp.asarray(cls_lp), M, return_runs=True)
    comp = np.asarray(comp)
    comp_c = np.asarray(runs[1])

    table = rng.randint(0, 1 << 20, size=(M,)).astype(np.int32)
    out = jax.jit(D._run_apply)(jnp.asarray(table), jnp.asarray(comp_c),
                                jnp.asarray(comp), runs)
    np.testing.assert_array_equal(np.asarray(out), table[comp])

    vals = rng.randint(0, 1 << 28, size=(H, W)).astype(np.int32)
    got = jax.jit(D._run_segment_max, static_argnums=(4,))(
        jnp.asarray(vals), jnp.asarray(comp), jnp.asarray(comp_c),
        runs, M)
    exp = np.full((M,), np.iinfo(np.int32).min, np.int64)
    np.maximum.at(exp, comp.reshape(-1), vals.reshape(-1))
    live = exp > np.iinfo(np.int32).min
    np.testing.assert_array_equal(np.asarray(got)[live], exp[live])


def test_densify_stats_falls_back_beyond_run_slots():
    """A grid whose every pixel is its own component has N column runs
    (> RUN_SLOTS) — the cond must select the exact scatter path."""
    H, W, C, M = 256, 256, 3, 1024  # 65536 runs > 32768
    assert H * W > D.RUN_SLOTS
    label = np.arange(H * W, dtype=np.int32).reshape(H, W)
    rng = np.random.RandomState(0)
    cls_lp = -rng.rand(H, W, C).astype(np.float32)
    comp, lp, size, froz, ntot = jax.jit(
        D._densify_stats, static_argnums=(2,))(
            jnp.asarray(label), jnp.asarray(cls_lp), M)
    comp_e, lp_e, size_e, ntot_e = _slow_reference(label, cls_lp, M)
    np.testing.assert_array_equal(np.asarray(comp), comp_e)
    np.testing.assert_array_equal(np.asarray(size), size_e)
    np.testing.assert_allclose(np.asarray(lp), lp_e,
                               rtol=1e-5, atol=1e-3)
    assert int(ntot) == ntot_e == H * W
    # overflow freezing still applies (components beyond M clamp+freeze)
    assert bool(np.asarray(froz)[M - 1])
