"""Run-granular pair dedup (decoder/device.py::_run_dedup).

The round-4 fast path drops `_block_dedup`'s per-block key sort: in
column-major order equal pair keys are already contiguous (key runs are
intersections of the component grid's column runs with its shifted
self's), so per-run oml sums come from row-cumsum differences at run
ends and one 2-int sort compacts the live run ends.  It must aggregate
identically to `_block_dedup` (up to f32 summation order) and to a
float64 numpy reference, and `_pair_phase` must fall back to the sorted
`_block_dedup` (lax.cond) when a row's live run count exceeds
`dedup_slots`."""

import numpy as np
import pytest

import jax.numpy as jnp

from mergenet_tpu.decoder import device as D

OFFSETS = ((0, 1), (1, 0), (-1, 2), (2, -1), (0, 3), (3, 0))


def _scene(rng, H, W, M2):
    comp2d = jnp.asarray(
        (rng.randint(0, 7, (H // 8, W // 8)).repeat(8, 0).repeat(8, 1)
         + 7 * (np.arange(H)[:, None] // 16)), jnp.int32) % M2
    froz2d = jnp.asarray(rng.rand(H, W) < 0.02)
    log_odds = jnp.asarray(rng.randn(len(OFFSETS), H, W)
                           .astype(np.float32))
    return comp2d, froz2d, log_odds


def _keys(comp2d, froz2d, P, SENT, transposed):
    """Per-offset pair-key planes; `transposed` builds the column-major
    (O, W, H) layout _run_dedup consumes (offset (di,dj) -> (dj,di))."""
    g = comp2d.T if transposed else comp2d
    f = froz2d.T if transposed else froz2d
    planes = []
    for di, dj in OFFSETS:
        sh = (dj, di) if transposed else (di, dj)
        c2 = D._shift2d(g, *sh, -1)
        f2 = D._shift2d(f, *sh, True)
        ext = (c2 >= 0) & (c2 != g) & ~f & ~f2
        planes.append(jnp.where(ext, jnp.minimum(g, c2) * P
                                + jnp.maximum(g, c2), SENT))
    return jnp.stack(planes)


def _np_reference(keyT, omlT, SENT):
    agg = {}
    for k, v in zip(np.asarray(keyT).reshape(-1),
                    np.asarray(omlT).reshape(-1).astype(np.float64)):
        if k < SENT:
            agg[int(k)] = agg.get(int(k), 0.0) + v
    return agg


def test_run_dedup_matches_block_and_numpy():
    rng = np.random.RandomState(0)
    H, W, M2 = 64, 96, 50
    P = M2 + 1
    SENT = P * P - 1
    comp2d, froz2d, log_odds = _scene(rng, H, W, M2)
    keyT = _keys(comp2d, froz2d, P, SENT, transposed=True)
    key_rm = _keys(comp2d, froz2d, P, SENT, transposed=False)
    # the transposed planes are the same keys (layout check)
    for oi in range(len(OFFSETS)):
        assert np.array_equal(np.asarray(keyT[oi]).T,
                              np.asarray(key_rm[oi]))
    omlT = log_odds.transpose(0, 2, 1)

    pair_slots, block, slots = 256, 256, 128
    keyr, omlr, firstr, deadr = D._dedup_rows(keyT, omlT, H, SENT, block)
    nlive = int(jnp.max(jnp.sum((firstr & ~deadr).astype(jnp.int32),
                                axis=1)))
    assert nlive <= slots, "test scene must fit the fast path"
    run = D._run_dedup(keyr, omlr, firstr, deadr, P, SENT, pair_slots,
                       slots)
    blk = D._block_dedup(keyT.reshape(-1), omlT.reshape(-1), P, SENT,
                         pair_slots, block, slots)

    ref = _np_reference(keyT, omlT, SENT)
    for name, (plo, phi, oml, stats) in (("run", run), ("block", blk)):
        got = {int(l) * P + int(h): float(o)
               for l, h, o in zip(np.asarray(plo), np.asarray(phi),
                                  np.asarray(oml)) if l >= 0}
        assert got.keys() == ref.keys(), name
        for k, v in ref.items():
            assert abs(got[k] - v) < 1e-3 * max(1.0, abs(v)), \
                (name, k, got[k], v)
        assert int(stats["edges_dropped"]) == 0
        assert int(stats["pairs_dropped"]) == 0
        assert int(stats["pairs_total"]) == len(ref)
        assert int(stats["n_ext"]) == sum(
            1 for k in np.asarray(keyT).reshape(-1) if k < SENT)


def test_decode_hierarchical_run_dedup_equals_mono():
    """The serving default (dedup_block run path) decodes identically to
    the monolithic one-sort dedup on a noisy scene."""
    rng = np.random.RandomState(1)
    H, W, C = 64, 96, 5
    cp = jnp.asarray(rng.rand(H, W, C).astype(np.float32) * .9 + .05)
    sp = jnp.asarray(rng.rand(H, W, len(OFFSETS)).astype(np.float32)
                     * .9 + .05)
    # dedup_slots = the full row width: the fast path can never
    # overflow, so the decode must equal the mono (drop-free) dedup
    new = D.decode_hierarchical(cp, sp, C, OFFSETS, dedup_block=256,
                                dedup_slots=256, return_stats=True)
    mono = D.decode_hierarchical(cp, sp, C, OFFSETS, dedup_block=None,
                                 return_stats=True)
    assert np.array_equal(np.asarray(new[0]), np.asarray(mono[0]))
    assert np.array_equal(np.asarray(new[1]), np.asarray(mono[1]))
    assert int(new[3]["edges_dropped"]) == 0


def test_run_dedup_overflow_falls_back_to_block(monkeypatch):
    """When a row's live run count exceeds dedup_slots, _pair_phase must
    take the sorted _block_dedup branch.  Proof by poisoning: a
    monkeypatched _run_dedup returns garbage — if the lax.cond wrongly
    selected the fast branch on the over-budget scene the decode would
    change; it must not.  (And on an in-budget scene the poison MUST
    change the decode, proving the fast branch is really exercised.)"""
    rng = np.random.RandomState(2)
    H, W, C = 32, 48, 4
    cp = jnp.asarray(rng.rand(H, W, C).astype(np.float32) * .9 + .05)
    # low sameness -> no flood/absorb merging -> maximal live runs
    sp = jnp.asarray(rng.rand(H, W, len(OFFSETS)).astype(np.float32)
                     * .3 + .05)
    # the big merge bias guarantees every surviving pair merges, so
    # wiping the pair list visibly changes the in-budget decode
    kw = dict(dedup_block=64, merge_logprob_bias=5.0, return_stats=True)
    over = D.decode_hierarchical(cp, sp, C, OFFSETS, dedup_slots=2, **kw)
    fit = D.decode_hierarchical(cp, sp, C, OFFSETS, dedup_slots=512,
                                **kw)

    real = D._run_dedup

    def poisoned(key, oml, first, dead, P, SENT, pair_slots, slots):
        plo, phi, pair_oml, stats = real(key, oml, first, dead, P, SENT,
                                         pair_slots, slots)
        return (jnp.full_like(plo, -1), jnp.full_like(phi, -1),
                jnp.zeros_like(pair_oml), stats)

    monkeypatch.setattr(D, "_run_dedup", poisoned)
    D.decode_hierarchical.clear_cache()
    over_p = D.decode_hierarchical(cp, sp, C, OFFSETS, dedup_slots=2,
                                   **kw)
    fit_p = D.decode_hierarchical(cp, sp, C, OFFSETS, dedup_slots=512,
                                  **kw)
    monkeypatch.undo()
    D.decode_hierarchical.clear_cache()
    # over-budget scene: block branch selected, poison invisible
    assert np.array_equal(np.asarray(over[0]), np.asarray(over_p[0]))
    # in-budget scene: fast branch selected, poison visible (there ARE
    # pairs to merge on this scene; wiping them changes the decode)
    assert int(fit[3]["pairs_total"]) > 0
    assert not np.array_equal(np.asarray(fit[0]), np.asarray(fit_p[0]))
