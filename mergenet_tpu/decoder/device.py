"""On-device parallel merge decoder (JAX / XLA on TPU).

The reference decode is an inherently serial priority-queue greedy
(`utils/segmenter.py:432-483`, `utils/csegment/segment.cc:520-573`): ~43 s
per 512x1024 frame on one CPU core.  This module reformulates the same
objective — greedily maximize total image log-likelihood until *no
component pair with non-negative merge priority remains* — for TPU
execution out of vector ops, rolls, segmented scans, packed 1-key sorts
and cumsums (scatters/segment-ops are avoided at large sizes; they're
10-100x slower than sorts on v5e — docs/benchmarks.md).

Two decoders share the building blocks (full design: docs/decoder.md):

  * `decode_hierarchical` — the CERTIFIED serving decode (one dispatch,
    ~83 ms at 512x1024 on v5e): conservative flood fill -> same-class
    absorption round(s) with UP-SIZE hooking (a Pallas kernel fuses the
    edge scan on TPU) -> one-sort pair dedup with stream compaction ->
    aggregated Boruvka pair rounds.  Mask-AP parity with the C++ greedy
    on trained-model outputs, measured ahead
    (tests/test_decoder_certification.py, docs/benchmarks.md).

  * `decode_on_device` / `run_segmentation_device` — the progressive
    exact mode (the overflow-proof serving FALLBACK and on-device
    quality reference): a rolls-only first Boruvka round
    (`boruvka_rolls_round`, exact on singletons), then ANNEALED
    aggregated pair rounds (greedy-order emulation; see the root-cause
    note in docs/decoder.md "Exact mode") with capacities bucketed from
    MEASURED live counts (overflow-impossible).

Both satisfy the greedy's fixed-point condition; priority formulas match
the reference exactly ((oml*factor + class_delta)/(n1+n2) + bias,
`segment.cc:145-150`, or the 'product' variant `segmenter.py:189-193`).
Greedy equivalence is exact on oracle inputs; on trained-model outputs
the fixed points differ (merge order matters) and both modes measure
AHEAD of the C++ greedy on instance AP — hier +4.9, annealed exact +1.5
over a 50-image 512x1024 val sweep (docs/decoder.md,
tests/test_device_decoder.py, tests/test_decoder_certification.py).

Layout: channel-last (H, W, C)/(H, W, O) — what the nets emit — so forward
+ decode runs end-to-end on device with no transpose or host round-trip.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -3.0e38


def _tgather(table, idx):
    """out = table[idx] — via the Pallas VMEM lane-gather kernel when the
    table fits its size bound on a TPU backend (XLA lowers the N-indexed
    lookup to a ~3.7-5 ms scalar loop at N=512k; the kernel runs 0.7 ms
    at M=8192 / 2.0 ms at M=65536, bit-identical on the full int32 index
    domain — ops/pallas/tgather.py).  Falls back to the XLA gather
    elsewhere; MERGENET_TGATHER=0 forces the fallback (equivalence
    checks).  NOTE: both the env var and `jax.default_backend()` are
    read at TRACE time — a cached jitted decode keeps whichever path it
    traced, so toggling MERGENET_TGATHER requires `jax.clear_caches()`
    (tests/test_tgather.py::test_tpu_decode_bit_identity does exactly
    this), and explicit placement on a non-default device follows the
    DEFAULT backend's choice (both paths compute identical values, so
    this only affects speed, never results)."""
    import os
    from ..ops.pallas.tgather import table_gather, table_gather_supported
    if (table.dtype == jnp.int32 and table.ndim == 1
            and os.environ.get("MERGENET_TGATHER", "1") != "0"
            and jax.default_backend() == "tpu"
            and table_gather_supported(idx.size, table.shape[0])):
        return table_gather(table, idx)
    return table[idx]


def _seg_min_scan(label, link, axis, reverse=False):
    """Segmented min-scan: propagate the running minimum along `axis`
    through elements whose `link` flag marks them connected to their
    predecessor (in scan direction)."""
    flags = ~link

    def op(a, b):
        m1, f1 = a
        m2, f2 = b
        return (jnp.where(f2, m2, jnp.minimum(m1, m2)), f1 | f2)

    m, _ = jax.lax.associative_scan(op, (label, flags), axis=axis,
                                    reverse=reverse)
    return m


def _log_domain(class_probs, sameness_probs, same_different_bias,
                from_logits=False):
    """Common per-pixel preprocessing: clipped log class probs and
    sameness log-odds (with the optional logit-domain re-bias).

    log_odds comes back PLANE-MAJOR (O, H, W): every downstream stage
    reads whole per-offset planes (flood links, the Pallas absorb scan —
    which requires this layout — and the dedup's flattened edge payload,
    which becomes a zero-copy reshape).  Decode time is unchanged (XLA
    fused the old minor-axis slices equally well); this is layout
    simplification, not a measured speedup.

    With `from_logits=True` the inputs are the net's raw LOGITS and the
    sigmoid -> clip -> log round trip is collapsed algebraically
    (serving fast path — skips ~29 transcendental planes per frame):
      log(clip(sigmoid(l), eps, 1-eps))
          == clip(log_sigmoid(l), log(eps), log1p(-eps))
      logit(clip(sigmoid(l), eps, 1-eps)) == clip(l, -L, L),
          L = log((1-eps)/eps)
    Same function up to f32 rounding; mask-identity with the probs path
    is pinned on a committed trained fixture
    (tests/test_from_logits.py)."""
    f32 = jnp.float32
    eps = f32(1.1920929e-07)
    if from_logits:
        L = f32(15.942385)  # log((1-eps)/eps)
        cl = class_probs.astype(f32)
        sl = jnp.moveaxis(sameness_probs, -1, 0).astype(f32)
        cls_lp_pix = jnp.clip(-jax.nn.softplus(-cl),
                              jnp.log(eps), jnp.log1p(-eps))
        log_odds = jnp.clip(sl, -L, L)
        if same_different_bias:
            log_odds = jnp.clip(log_odds + f32(same_different_bias),
                                -L, L)
        return cls_lp_pix, log_odds
    cp = jnp.clip(class_probs.astype(f32), eps, 1.0 - eps)
    sp = jnp.clip(jnp.moveaxis(sameness_probs, -1, 0).astype(f32),
                  eps, 1.0 - eps)
    if same_different_bias:
        logit = (jnp.log(sp) - jnp.log1p(-sp) + same_different_bias)
        sp = jnp.clip(jax.nn.sigmoid(logit), eps, 1.0 - eps)
    cls_lp_pix = jnp.log(cp)                       # (H, W, C)
    log_odds = jnp.log(sp) - jnp.log1p(-sp)        # (O, H, W)
    return cls_lp_pix, log_odds


def _shift2d(x, di, dj, fill):
    """x shifted so out[i, j] = x[i + di, j + dj], out-of-range -> fill.
    Uses rolls (layout-friendly on TPU) with border fix-up."""
    H, W = x.shape[:2]
    out = jnp.roll(jnp.roll(x, -di, axis=0), -dj, axis=1)
    if di != 0:
        rows = jnp.arange(H)[:, None]
        ok = (rows + di >= 0) & (rows + di < H)
        out = jnp.where(ok if out.ndim == 2 else ok[..., None], out, fill)
    if dj != 0:
        cols = jnp.arange(W)[None, :]
        ok = (cols + dj >= 0) & (cols + dj < W)
        out = jnp.where(ok if out.ndim == 2 else ok[..., None], out, fill)
    return out


def _contract(parent, two_cycle_break=True, unroll=False):
    """Pointer-jump `parent` (1-D int32 forest) to a FIXED POINT
    (parent[i] == root id for every i) — the shared contraction idiom of
    every hook-and-contract round and the flood-fill canonicalization.

    `two_cycle_break=True` first resolves mutual hooks a<->b to the
    smaller id (cycles longer than 2 are impossible under the
    larger-partner tie-break the hook phases use); pass False when the
    input is already acyclic with parent[i] <= i (the flood fill's
    min-scan labels).  ceil(log2 n) squarings always suffice;
    `unroll=True` emits them as unrolled gathers (cheaper than a
    while_loop for small n inside already-unrolled round bodies), the
    default is an early-exit while_loop."""
    n = parent.shape[0]
    ids = jnp.arange(n, dtype=parent.dtype)
    if two_cycle_break:
        parent = jnp.where((parent[parent] == ids) & (ids < parent), ids,
                           parent)
    n_jump = max(1, int(np.ceil(np.log2(max(n, 2)))))
    if unroll:
        for _ in range(n_jump):
            parent = parent[parent]
        return parent

    def cond(s):
        p, changed, it = s
        return changed & (it < n_jump)

    def body(s):
        p, _, it = s
        p2 = p[p]
        return (p2, jnp.any(p2 != p), it + 1)

    parent, _, _ = jax.lax.while_loop(cond, body,
                                      (parent, jnp.asarray(True), 0))
    return parent


def _contract_prefix(parent, n_live, small=8192):
    """`_contract` for a forest whose LIVE entries occupy the dense
    prefix [0, n_live) with every parent value < n_live, entries at or
    beyond n_live being identity (the absorb stage: hooks only exist for
    live dense component ids).  When n_live fits `small`, pointer
    jumping runs on the static prefix slice — a pointer-jump gather
    costs ~0.58 ms at M=65536 vs ~0.14 ms at 8192 (xprof, round 5) and
    the absorb forest needs ~8 jumps — else the full-size loop runs.
    Identical output either way (prefix closure: no live entry can point
    past n_live)."""
    M = parent.shape[0]
    if small >= M:
        return _contract(parent)

    def fast(p):
        return p.at[:small].set(_contract(p[:small]))

    return jax.lax.cond(n_live <= small, fast, _contract, parent)


@functools.partial(
    jax.jit,
    static_argnames=("num_classes", "offsets", "den_mode",
                     "same_different_bias", "object_merge_factor",
                     "merge_logprob_bias"))
def boruvka_rolls_round(class_probs, sameness_probs, num_classes, offsets,
                        same_different_bias=0.0, object_merge_factor=1.0,
                        merge_logprob_bias=0.0, den_mode="sum",
                        hook_threshold=0.0):
    """The FIRST aggregated-Boruvka round, computed entirely with rolls.

    On singleton components every unordered pixel pair is linked by at most
    one offset edge (`CoreConfig` forbids negated-pair offsets, reference
    `utils/core_config.py:66-73`), so the per-edge merge priority IS the
    aggregated pair priority and round 1 of `decode_on_device`'s phase 3
    needs no sorts or segment ops at all: per-offset priority planes come
    from rolls, each pixel hooks to its best non-negative partner
    (ties -> larger partner id, exactly `round_body`'s segment_max
    tie-break), 2-cycles resolve to the smaller id, and pointer jumping
    contracts the hooking forest.  ~100x cheaper than the sort-based round
    at full edge count.

    hook_threshold: only hook pairs whose priority is >= this value
    (default 0 = every non-negative pair, the plain Boruvka round).  A
    positive threshold defers low-confidence pairs to later aggregated
    rounds — the greedy-ORDER emulation that closes the exact mode's AP
    gap (see `run_segmentation_device` and docs/decoder.md): applying
    every weakly-positive singleton hook simultaneously commits
    cross-instance seam merges the serial greedy would re-evaluate
    against aggregated pair evidence and reject.

    Returns:
        label: (H, W) int32 root PIXEL ids (self-rooted: label[root]==root),
            directly usable as `decode_on_device(initial_labels=...)`.
        n_comp: () int32 number of components.
        n_ext: () int32 number of (pixel, offset) edges whose endpoints lie
            in different components (the edge capacity needed by a
            subsequent compaction pass).
    """
    H, W = class_probs.shape[:2]
    N = H * W
    f32 = jnp.float32
    omf = f32(object_merge_factor)
    bias = f32(merge_logprob_bias)
    cls_lp_pix, log_odds = _log_domain(class_probs, sameness_probs,
                                       same_different_bias)
    best_pix = jnp.max(cls_lp_pix, axis=-1)        # (H, W)

    pix_id = jnp.arange(N, dtype=jnp.int32).reshape(H, W)
    best_pri = jnp.full((H, W), NEG_INF, f32)
    best_partner = jnp.full((H, W), -1, jnp.int32)

    def consider(pri, partner):
        nonlocal best_pri, best_partner
        take = (pri > best_pri) | ((pri == best_pri) &
                                   (partner > best_partner))
        best_pri = jnp.where(take, pri, best_pri)
        best_partner = jnp.where(take, partner, best_partner)

    for oi, (di, dj) in enumerate(offsets):
        oml = log_odds[oi]
        joint = jnp.max(cls_lp_pix + _shift2d(cls_lp_pix, di, dj, 0.0),
                        axis=-1)
        cdl = joint - best_pix - _shift2d(best_pix, di, dj, 0.0)
        if den_mode == "sum":
            pri = (oml * omf + cdl) / 2.0 + bias
        else:
            pri = oml * omf + cdl + bias
        # forward edge p -> p+o
        partner_fwd = _shift2d(pix_id, di, dj, -1)
        consider(jnp.where(partner_fwd >= 0, pri, NEG_INF), partner_fwd)
        # backward edge p -> p-o (the same edge seen from its other end)
        pri_bwd = _shift2d(pri, -di, -dj, NEG_INF)
        partner_bwd = _shift2d(pix_id, -di, -dj, -1)
        consider(jnp.where(partner_bwd >= 0, pri_bwd, NEG_INF), partner_bwd)

    hook = best_pri >= f32(hook_threshold)
    parent = _contract(jnp.where(hook, best_partner, pix_id).reshape(-1))

    ids = jnp.arange(N, dtype=jnp.int32)
    label = parent.reshape(H, W)
    n_comp = jnp.sum((parent == ids).astype(jnp.int32))
    n_ext = jnp.zeros((), jnp.int32)
    for (di, dj) in offsets:
        other = _shift2d(label, di, dj, -1)
        n_ext = n_ext + jnp.sum(((other >= 0) &
                                 (other != label)).astype(jnp.int32))
    return label, n_comp, n_ext




def _flood_fill(argmax_pix, log_odds, offsets, den_mode, omf, bias,
                ccl_sweeps, ccl_margin):
    """Segmented-scan flood fill over strong unit-stride edges.

    An edge is *strong* when both pixels share an argmax class (class
    delta = 0) and its pixel-level priority is non-negative with log-odds
    above `ccl_margin`; with a positive margin an erosion guard keeps any
    pixel with one weak short-offset edge out of the flood (fuzzy boundary
    rings are left to the aggregated phases).  Connected runs collapse via
    segmented min-scans along rows and columns — pure vector work.
    Returns self-rooted root-pixel-id labels (H, W) int32."""
    H, W = argmax_pix.shape
    N = H * W
    label = jnp.arange(N, dtype=jnp.int32).reshape(H, W)
    if not ccl_sweeps:
        return label


    def strong_edge(oi, di, dj):
        """(H, W) bool: strong edge from (i, j) to (i+di, j+dj)."""
        same_cls = argmax_pix == jnp.roll(
            jnp.roll(argmax_pix, -di, axis=0), -dj, axis=1)
        oml = log_odds[oi]
        if den_mode == "sum":
            pri = oml * omf / 2.0 + bias
        else:
            pri = (oml * omf + bias)
        ok = same_cls & (pri >= 0.0) & (oml > ccl_margin)
        # border validity
        if di > 0:
            ok = ok & (jnp.arange(H)[:, None] < H - di)
        elif di < 0:
            ok = ok & (jnp.arange(H)[:, None] >= -di)
        if dj > 0:
            ok = ok & (jnp.arange(W)[None, :] < W - dj)
        elif dj < 0:
            ok = ok & (jnp.arange(W)[None, :] >= -dj)
        return ok

    offs = list(offsets)

    def smallest_axis_offset(axis):
        """The smallest purely-horizontal (axis=1) or purely-vertical
        (axis=0) offset in the set — the offset grids need not contain
        (0,1)/(1,0) (e.g. generate_offsets(80, 10) yields (0, 2))."""
        cands = [(i, o) for i, o in enumerate(offs)
                 if o[1 - axis] == 0 and o[axis] != 0]
        if not cands:
            return None
        return min(cands, key=lambda t: abs(t[1][axis]))

    def axis_links(axis):
        """Forward/backward link planes for stride-s segmented scans along
        `axis`, plus the stride s.  S[..pos..] is the strong edge between
        positions p and p+s along the axis; None when no axis-aligned
        offset exists or the stride doesn't divide the extent."""
        pick = smallest_axis_offset(axis)
        if pick is None:
            return None
        oi, o = pick
        d = o[axis]
        s = abs(d)
        extent = (H, W)[axis]
        if extent % s != 0:
            return None
        e = strong_edge(oi, *o)
        if d < 0:
            # edge (p) -> (p - s): canonicalize to S[p - s] between
            # (p - s, p)
            e = jnp.roll(e, -s, axis=axis)
        return e, s

    ccl = ccl_sweeps
    h_links = axis_links(1) if ccl else None
    v_links = axis_links(0) if ccl else None
    # erosion guard (conservative mode, ccl_margin > 0): only pixels whose
    # ALL short-offset incident edges are strong may flood.  Fuzzy boundary
    # rings (where a single marginal edge could irreversibly fuse two
    # same-class objects) stay out of phase 1 and are resolved by phase 3's
    # aggregated merging.
    pixel_ok = jnp.ones((H, W), bool)
    for links, axis in ((h_links, 1), (v_links, 0)):
        if links is None or ccl_margin <= 0:
            continue
        S, stride = links
        pos = jnp.arange((H, W)[axis])
        pos = pos[:, None] if axis == 0 else pos[None, :]
        extent = (H, W)[axis]
        oob_fwd = pos >= extent - stride   # no forward partner
        oob_bwd = pos < stride             # no backward partner
        bwd = jnp.roll(S, stride, axis=axis)
        pixel_ok = pixel_ok & (S | oob_fwd) & (bwd | oob_bwd)
    if h_links is not None:
        S, stride = h_links
        h_links = (S & pixel_ok &
                   jnp.roll(pixel_ok, -stride, axis=1), stride)
    if v_links is not None:
        S, stride = v_links
        v_links = (S & pixel_ok &
                   jnp.roll(pixel_ok, -stride, axis=0), stride)
    if h_links is not None or v_links is not None:
        from ..ops.pallas.floodscan import (flood_scan,
                                            flood_scan_supported)
        if flood_scan_supported(H, W):
            # fused Pallas kernel: all ccl x (H, V) segmented min-scans
            # run VMEM-resident in one dispatch (bit-identical to
            # _scan_sweeps; tests/test_pallas_floodscan.py)
            label = flood_scan(
                None if h_links is None else h_links[0],
                None if v_links is None else v_links[0],
                None if h_links is None else h_links[1],
                None if v_links is None else v_links[1], ccl)
        else:
            label = _scan_sweeps(label, h_links, v_links, ccl)
        # canonicalize to a FIXED POINT (flat[flat] == flat).  A fixed
        # number of passes does NOT suffice (scan sweeps can leave
        # chains longer than 4), and the densify stages'
        # `is_rep = (flat == arange)` representative test silently
        # conflates components on non-self-rooted labels.  The min-scans
        # guarantee label[p] <= p (acyclic), so no 2-cycle break needed.
        label = _contract(label.reshape(-1),
                          two_cycle_break=False).reshape(H, W)
    return label


def _scan_sweeps(label, h_links, v_links, ccl):
    """`ccl` sweeps of stride-sublattice segmented min-scans (H then V) —
    the jnp reference path of the fused Pallas kernel
    (`ops/pallas/floodscan.py`); each `*_links` is (S, stride) or None
    with S[p] the strong edge between positions p and p+stride."""
    H, W = label.shape

    def scan_axis(label, e, s, axis):
        """Segmented min-scan along `axis` with stride-s links: view
        the axis as (extent//s, s) so each stride-sublattice scans as a
        contiguous chain."""
        if axis == 1:
            shape3 = (H, W // s, s)
        else:
            shape3 = (H // s, s, W)
        scan_ax = 1 if axis == 1 else 0
        L = label.reshape(shape3)
        S = e.reshape(shape3)
        fwd = jnp.roll(S, 1, axis=scan_ax)
        idx = [slice(None)] * 3
        idx[scan_ax] = 0
        fwd = fwd.at[tuple(idx)].set(False)
        L = _seg_min_scan(L, fwd, axis=scan_ax)
        L = _seg_min_scan(L, S, axis=scan_ax, reverse=True)
        return L.reshape(H, W)

    for _ in range(ccl):
        if h_links is not None:
            label = scan_axis(label, h_links[0], h_links[1], 1)
        if v_links is not None:
            label = scan_axis(label, v_links[0], v_links[1], 0)
    return label


#: run-compaction table size: in-budget when a label grid has at most
#: this many column-major runs (trained 512x1024 outputs measure ~8-12k;
#: `_densify_stats` falls back to the scatter path beyond it, so this is
#: a pure budget, not a correctness bound)
RUN_SLOTS = 32768


def _col_run_ends(label):
    """Column-major run structure of a label grid.

    Connected components are spatially contiguous, so along each column
    a label grid is a few RUNS of equal ids (measured ~11 runs/column on
    trained 512x1024 outputs vs H=512 pixels) — per-run work replaces
    per-pixel scatter/segment ops, which XLA lowers to ~N-cost scalar
    loops on TPU (docs/benchmarks.md).  Rows would not do: the offset
    grid needs no (0,1) link, so flood components can interleave
    even/odd columns and row runs degenerate to length 1 (measured).

    Returns (lab_cm (N,) column-major labels, last (N,) bool run-end
    flags, gidx (N,) int32 global run index in column-major order).
    Runs never span columns (each column's first pixel starts a run)."""
    lt = label.T  # (W, H)
    W, H = lt.shape
    first = jnp.concatenate(
        [jnp.ones((W, 1), bool), lt[:, 1:] != lt[:, :-1]], axis=1)
    last = jnp.concatenate(
        [first[:, 1:], jnp.ones((W, 1), bool)], axis=1)
    fflat = first.reshape(-1)
    gidx = (jnp.cumsum(fflat.astype(jnp.int32)) - 1).astype(jnp.int32)
    return lt.reshape(-1), last.reshape(-1), gidx


def _run_fill_cols(ends_val, H, W):
    """Broadcast per-run values (placed at run-END positions, -1
    elsewhere, column-major (N,)) to every pixel of the run: each pixel
    takes the nearest non-negative value at-or-below it in its column.
    Returns (H, W) row-major."""
    y = jnp.flip(ends_val.reshape(W, H), axis=1)
    filled = jax.lax.associative_scan(
        lambda a, b: jnp.where(b >= 0, b, a), y, axis=1)
    return jnp.flip(filled, axis=1).T


def _run_apply(table, comp_c, comp2d_s1, runs, vals_c=None,
               table_fn=None):
    """table[comp2d_s1] (one N-sized table apply) computed at RUN
    granularity: gather the table at the runs' component ids (G-sized),
    scatter to the run-end positions and fill each run — ~0.8 ms vs the
    ~2 ms Pallas table gather / ~3.7 ms XLA scalar-loop gather at
    N=512k.  `comp_c` are the CURRENT component ids at the run ends
    (the stage-1 ids composed through whatever parent tables apply).
    Table values must be >= 0 (-1 is the fill sentinel; every decoder
    table here is nonnegative).  Falls back to the Pallas/XLA gather
    when the grid exceeded the run budget.

    `vals_c` (optional): precomputed table[comp_c] — callers that can
    compose the per-run values with G-sized gathers pass them directly
    so the M-sized table is never materialized on the fast path.
    `table_fn` (optional, with vals_c): builds the full table lazily
    INSIDE the fallback branch — its M-sized gathers only execute when
    the run budget overflowed."""
    pos, _, _, runs_ok = runs
    H, W = comp2d_s1.shape
    N = H * W

    def fast(_):
        v = table[comp_c] if vals_c is None else vals_c
        ends = jnp.full((N,), -1, jnp.int32).at[pos].set(v)
        return _run_fill_cols(ends, H, W)

    def slow(_):
        tab = table if table_fn is None else table_fn()
        return _tgather(tab, comp2d_s1)

    return jax.lax.cond(runs_ok, fast, slow, operand=None)


def _run_segment_max(vals2d, comp2d, comp_c, runs, M):
    """segment_max(vals2d.reshape(-1), comp2d.reshape(-1), M) at RUN
    granularity: a segmented column cummax (resets at run starts), the
    per-run maxima read at the run ends, and a G-sized segment_max —
    replacing the N-sized scatter-lowered segment_max (~4.6 ms at
    N=512k, xprof).  `comp_c` are the current component ids at the run
    ends (`comp2d`'s value on each run).  vals2d (H, W) int32."""
    pos, _, first_cm, runs_ok = runs
    H, W = vals2d.shape

    def fast(_):
        v = vals2d.T  # column-major (W, H)
        f = first_cm.reshape(W, H)

        def op(a, b):
            av, af = a
            bv, bf = b
            return (jnp.where(bf, bv, jnp.maximum(av, bv)), af | bf)

        m, _ = jax.lax.associative_scan(op, (v, f), axis=1)
        return jax.ops.segment_max(m.reshape(-1)[pos], comp_c,
                                   num_segments=M)

    def slow(_):
        return jax.ops.segment_max(vals2d.reshape(-1),
                                   comp2d.reshape(-1), num_segments=M)

    return jax.lax.cond(runs_ok, fast, slow, operand=None)


def _densify_stats_runs(label, cls_lp_pix, M, G=RUN_SLOTS):
    """Run-compacted `_densify_stats` fast path (identical outputs up to
    f32 summation order; the caller lax.cond's to the scatter path when
    the grid exceeds G runs).  All O(N) work is vector scans/compares +
    ONE width-1 scatter; the aggregation itself runs at G entries.

    Per-run class-logprob sums come from PER-COLUMN f32 cumsums
    differenced at consecutive run ends (column magnitude <= ~8k keeps
    the diff error ~1e-3 — the same argument as `_block_dedup`'s
    row-local sums); the first run of a column subtracts 0."""
    H, W = label.shape
    C = cls_lp_pix.shape[-1]
    N = H * W
    G = min(G, N)
    flat = label.reshape(-1).astype(jnp.int32)
    is_rep = (flat == jnp.arange(N, dtype=flat.dtype)).astype(jnp.int32)
    dense = (jnp.cumsum(is_rep) - 1).astype(jnp.int32)
    n_comp_total = dense[N - 1] + 1

    lab_cm, last, gidx = _col_run_ends(label)
    n_runs = gidx[N - 1] + 1
    # compact run-end positions to G slots with ONE unstable 2-int sort
    # (run indices are unique at run ends; sentinels sort to the tail) —
    # an .at[].max scatter compaction measured ~5 ms at N=512k, the sort
    # ~1.5 ms.  Unused slots point at N-1 (the final cumsum entry), so
    # their diffs are 0.
    keys = jnp.where(last, gidx, N)
    _, pos = jax.lax.sort(
        (keys, jnp.arange(N, dtype=jnp.int32)), num_keys=1,
        is_stable=False)
    pos = jnp.where(jnp.arange(G) < jnp.minimum(n_runs, G),
                    pos[:G], N - 1)
    comp_c = jnp.minimum(dense[lab_cm[pos]], M - 1)  # G-sized gathers

    vals = jnp.concatenate(
        [cls_lp_pix, jnp.ones((H, W, 1), jnp.float32)], axis=-1)
    cum = jnp.cumsum(vals.transpose(1, 0, 2), axis=1)  # per-column
    vals_c = cum.reshape(N, C + 1)[pos]
    prev_pos = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), pos[:-1]])
    same_col = (pos // H) == (prev_pos // H)
    prev_vals = jnp.concatenate(
        [jnp.zeros((1, C + 1), jnp.float32), vals_c[:-1]], axis=0)
    partial = vals_c - jnp.where(same_col[:, None], prev_vals, 0.0)
    valid = jnp.arange(G) < jnp.minimum(n_runs, G)
    partial = jnp.where(valid[:, None], partial, 0.0)
    agg = jax.ops.segment_sum(partial, comp_c, num_segments=M)

    ends_val = jnp.full((N,), -1, jnp.int32).at[pos].set(comp_c)
    comp_of_pix = _run_fill_cols(ends_val, H, W)

    frozen = jnp.zeros((M,), bool).at[M - 1].set(n_comp_total > M)
    # a run starts at element 0 and right after every run end
    first_cm = jnp.concatenate([jnp.ones((1,), bool), last[:-1]])
    runs = (pos, comp_c, first_cm, n_runs <= G)
    return (comp_of_pix, agg[:, :C], agg[:, C].astype(jnp.int32),
            frozen, n_comp_total, n_runs, runs)


def _densify_stats(label, cls_lp_pix, M, return_runs=False):
    """Densify root-pixel labels to component ids in [0, M) and aggregate
    per-component stats — the shared epilogue of every decode entry.

    `label` (H, W) must hold root PIXEL ids with the self-rooted property
    label.flat[root] == root (true for arange, for `_flood_fill`'s
    fixed-point canonicalization, and for the documented initial_labels /
    `boruvka_rolls_round` contract) — so the representative test is a
    compare, not an N-sized scatter.  Components beyond capacity all
    clamp into slot M-1, which is frozen (a one-element scatter instead
    of an N-sized segment_max; measured 7 ms at N=512k).  Sizes come
    from a ones column fused into the class-logprob segment_sum (counts
    < 2^24 are exact in f32).

    Dispatch: the run-compacted fast path (`_densify_stats_runs`) when
    the grid's column-run count fits RUN_SLOTS — the common case on
    real outputs, replacing the (N, C+1) scatter-lowered segment_sum +
    the N-sized dense[flat] gather (together ~13 ms of the 46 ms decode
    at 512x1024, xprof) with run-granular work — else the original
    scatter path, selected by lax.cond at trace-free runtime.

    Returns (comp2d (H,W) int32, cls_lp (M,C), size (M,) int32,
    frozen (M,) bool, n_comp_total scalar int32 incl. overflow)[,
    runs handle when return_runs — see `_run_apply`/`_run_segment_max`]."""
    H, W = label.shape
    C = cls_lp_pix.shape[-1]
    N = H * W

    def slow(_):
        flat = label.reshape(-1).astype(jnp.int32)
        is_rep = (flat == jnp.arange(N, dtype=flat.dtype)) \
            .astype(jnp.int32)
        dense = (jnp.cumsum(is_rep) - 1).astype(jnp.int32)
        comp_of_pix = jnp.minimum(dense[flat], M - 1)
        agg = jax.ops.segment_sum(
            jnp.concatenate([cls_lp_pix.reshape(N, C),
                             jnp.ones((N, 1), jnp.float32)], axis=1),
            comp_of_pix, num_segments=M)
        n_comp_total = dense[N - 1] + 1
        return (comp_of_pix.reshape(H, W), agg[:, :C],
                agg[:, C].astype(jnp.int32), n_comp_total)

    (comp2d, cls_lp, size, frozen, n_comp_total,
     n_runs, runs) = _densify_stats_runs(label, cls_lp_pix, M)
    comp2d, cls_lp, size, n_comp_total = jax.lax.cond(
        n_runs <= min(RUN_SLOTS, N),
        lambda _: (comp2d, cls_lp, size, n_comp_total),
        slow, operand=None)
    if return_runs:
        return comp2d, cls_lp, size, frozen, n_comp_total, runs
    return comp2d, cls_lp, size, frozen, n_comp_total


@functools.partial(
    jax.jit,
    static_argnames=("num_classes", "offsets", "den_mode", "max_rounds",
                     "do_prune", "same_different_bias",
                     "object_merge_factor", "merge_logprob_bias",
                     "prune_threshold", "max_components", "max_edges",
                     "ccl_sweeps", "ccl_margin", "anneal_start",
                     "anneal_halvings"))
def decode_on_device(class_probs, sameness_probs, num_classes, offsets,
                     same_different_bias=0.0, object_merge_factor=1.0,
                     merge_logprob_bias=0.0, den_mode="sum",
                     do_prune=False, prune_threshold=200.0,
                     max_rounds=64, max_components=None, max_edges=None,
                     ccl_sweeps=0, ccl_margin=0.0, anneal_start=32.0,
                     anneal_halvings=0, initial_labels=None):
    """Decode one image into instances, entirely on device.

    Args:
        class_probs: (H, W, C) float, sigmoid class probabilities.
        sameness_probs: (H, W, O) float.
        num_classes, offsets: model configuration (static).
        same_different_bias / object_merge_factor / merge_logprob_bias /
            den_mode / prune_threshold: segmenter hyperparameters (same
            semantics as `SegmenterOptions`).
        max_rounds: static cap on Boruvka rounds.
        max_components: capacity of the component arrays after phase 1
            (default: all pixels — exact; set ~N/4 for speed at full res).
        max_edges: capacity of the compacted external-edge arrays
            (default: all edges — exact).  On overflow, excess INITIAL
            component pairs are dropped whole (largest pair keys first,
            incl. the pair straddling the capacity boundary) so no pair
            ever contributes a truncated partial oml sum to the rounds;
            dropped pairs never merge directly.
        ccl_sweeps: row+column segmented-scan sweeps in phase 1.  Default
            0: flooding is an opt-in accelerator — per-edge flooding is
            exact on confident (oracle-like) inputs but can irreversibly
            fuse same-class neighbors through fuzzy seams of real model
            outputs, where phase 3's aggregated pair evidence is the
            faithful analogue of the greedy.  Enable (e.g. 3) together with
            capacity caps for throughput-tuned serving on validated data.
        ccl_margin: minimum per-edge log-odds for the phase-1 flood fill
            ("surely mergeable"; 2.0 ~ p(same) > 0.88).  Marginal edges are
            left to phase 3, which decides on aggregated pair evidence like
            the serial greedy.
        initial_labels: optional (H, W) int32 starting component labels;
            replaces the phase-1 flood fill.  Labels must be root PIXEL
            ids with the self-rooted property label.flat[root] == root
            (what `boruvka_rolls_round` returns).  Enables staged
            decoding: collapse singletons first, feed the labels back
            with capacity caps so the compaction works on far fewer
            components (see `decode_on_device_staged`).
        anneal_start / anneal_halvings: phase-3 priority-threshold
            annealing: round r only applies merges with priority >=
            anneal_start * 0.5^r (0 after anneal_halvings rounds).  This
            emulates the greedy's global best-first order: low-priority
            boundary merges are deferred until components have grown and
            their aggregated pair evidence is decisive.  Set
            anneal_halvings=0 to disable.

    Returns:
        comp: (H, W) int32 — final component id per pixel, in [0, M).
        root_class: (M,) int32 — class id per component root.
        is_instance_root: (M,) bool — live non-background components.
        Use `relabel_mask` for a compact 1..K instance mask.
    """
    H, W, C = class_probs.shape
    O = sameness_probs.shape[-1]
    assert C == num_classes and O == len(offsets)
    N = H * W
    M = N if max_components is None else min(max_components, N)
    f32 = jnp.float32
    omf = f32(object_merge_factor)
    bias = f32(merge_logprob_bias)

    cls_lp_pix, log_odds = _log_domain(class_probs, sameness_probs,
                                       same_different_bias)
    argmax_pix = jnp.argmax(cls_lp_pix, axis=-1)   # (H, W)

    # ---------------- phase 1: segmented-scan flood fill ----------------
    if initial_labels is not None:
        label = initial_labels.astype(jnp.int32)
    else:
        label = _flood_fill(argmax_pix, log_odds, offsets, den_mode, omf,
                            bias, ccl_sweeps, ccl_margin)

    comp2d, cls_lp, size, frozen, _ = _densify_stats(label, cls_lp_pix, M)

    # ---------------- phase 2: edge compaction ----------------
    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]
    ea_list, eb_list, ext_list = [], [], []
    for oi, (di, dj) in enumerate(offsets):
        b2 = jnp.roll(jnp.roll(comp2d, -di, axis=0), -dj, axis=1)
        valid = ((rows + di >= 0) & (rows + di < H) &
                 (cols + dj >= 0) & (cols + dj < W))
        ext = valid & (comp2d != b2)
        ea_list.append(comp2d.reshape(-1))
        eb_list.append(b2.reshape(-1))
        ext_list.append(ext.reshape(-1))
    ea = jnp.concatenate(ea_list)
    eb = jnp.concatenate(eb_list)
    eo = log_odds.reshape(-1)  # plane-major == concat of per-offset planes
    ext = jnp.concatenate(ext_list)
    E_all = int(ea.shape[0])
    K = E_all if max_edges is None else min(max_edges, E_all)
    # front-sort external edge INDICES by PAIR KEY (sentinel for internal
    # edges) instead of a bare flag: same 2-array sort cost, but kept
    # edges become pair-contiguous, so a max_edges cut can drop the pair
    # straddling the K boundary WHOLE (a partial run would contribute
    # truncated oml evidence to every later round — same policy as
    # _pair_phase).  Pairs wholly beyond K are dropped (largest keys
    # first); a pair whose run ends exactly at K is complete and kept.
    eidx = jnp.arange(E_all, dtype=jnp.int32)
    elo = jnp.minimum(ea, eb)
    ehi = jnp.maximum(ea, eb)
    if K == E_all:
        # no cap -> no truncation possible; the cheap flag front-sort
        # (2 int32 arrays) suffices
        flag = jnp.where(ext, 0, 1).astype(jnp.int32)
        flag_s, kept = jax.lax.sort((flag, eidx), num_keys=1)
        e_live = flag_s == 0
    elif (M + 1) * (M + 1) - 1 <= 2 ** 31 - 1:
        ekey = jnp.where(ext, elo * (M + 1) + ehi, (M + 1) * (M + 1) - 1)
        ekey_s, kept = jax.lax.sort((ekey, eidx), num_keys=1)
        straddles = (ekey_s[K] == ekey_s[K - 1]) if K < E_all \
            else jnp.asarray(False)
        ekey_s, kept = ekey_s[:K], kept[:K]
        e_live = ekey_s < (M + 1) * (M + 1) - 1
        e_live &= ~(straddles & (ekey_s == ekey_s[-1]))
    else:
        eklo = jnp.where(ext, elo, M)
        ekhi = jnp.where(ext, ehi, M)
        eklo_s, ekhi_s, kept = jax.lax.sort((eklo, ekhi, eidx), num_keys=2)
        straddles = ((eklo_s[K] == eklo_s[K - 1]) &
                     (ekhi_s[K] == ekhi_s[K - 1])) if K < E_all \
            else jnp.asarray(False)
        eklo_s, ekhi_s, kept = eklo_s[:K], ekhi_s[:K], kept[:K]
        e_live = eklo_s < M
        e_live &= ~(straddles & (eklo_s == eklo_s[-1]) &
                    (ekhi_s == ekhi_s[-1]))
    ea, eb, eo = ea[kept], eb[kept], eo[kept]

    # ---------------- phase 3: Boruvka rounds ----------------
    comp_ids = jnp.arange(M, dtype=jnp.int32)

    def round_body(state):
        ea, eb, total_map, cls_lp, size, frozen, _, rounds = state
        best_lp = jnp.max(cls_lp, axis=1)
        # priority-threshold annealing (greedy-order emulation)
        tau = jnp.where(
            rounds < anneal_halvings,
            jnp.float32(anneal_start) * jnp.exp2(-rounds.astype(f32)),
            jnp.float32(0.0))

        lo = jnp.minimum(ea, eb)
        hi = jnp.maximum(ea, eb)
        live = e_live & (lo != hi) & ~frozen[lo] & ~frozen[hi]
        lo_k = jnp.where(live, lo, M)
        hi_k = jnp.where(live, hi, M)
        if (M + 1) * (M + 1) - 1 <= 2 ** 31 - 1:
            # pack the pair into one int32 key: a 1-key 2-array sort is
            # substantially cheaper than the 2-key 3-array one
            key = lo_k * (M + 1) + hi_k
            key_s, oml_s = jax.lax.sort((key, eo), num_keys=1)
            lo_s = key_s // (M + 1)
            hi_s = key_s % (M + 1)
        else:
            lo_s, hi_s, oml_s = jax.lax.sort((lo_k, hi_k, eo), num_keys=2)

        first = jnp.concatenate([
            jnp.ones((1,), bool),
            (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])])
        run_id = (jnp.cumsum(first) - 1).astype(jnp.int32)
        run_oml = jax.ops.segment_sum(oml_s, run_id, num_segments=K,
                                      indices_are_sorted=True)
        pair_oml = run_oml[run_id]

        lo_c = jnp.minimum(lo_s, M - 1)
        hi_c = jnp.minimum(hi_s, M - 1)
        joint = cls_lp[lo_c] + cls_lp[hi_c]
        cdl = jnp.max(joint, axis=1) - best_lp[lo_c] - best_lp[hi_c]
        n1 = size[lo_c].astype(f32)
        n2 = size[hi_c].astype(f32)
        if den_mode == "sum":
            pri = (pair_oml * omf + cdl) / (n1 + n2) + bias
        else:
            pri = (pair_oml * omf + cdl + bias) / (n1 * n2)
        dead = lo_s >= M
        pri = jnp.where(dead, NEG_INF, pri)

        comp_best = jnp.maximum(
            jax.ops.segment_max(pri, lo_c, num_segments=M,
                                indices_are_sorted=True),
            jax.ops.segment_max(pri, hi_c, num_segments=M))
        comp_best = jnp.where(jnp.isfinite(comp_best), comp_best, NEG_INF)

        elig_lo = (pri == comp_best[lo_c]) & ~dead
        elig_hi = (pri == comp_best[hi_c]) & ~dead
        partner = jnp.maximum(
            jax.ops.segment_max(jnp.where(elig_lo, hi_c, -1), lo_c,
                                num_segments=M, indices_are_sorted=True),
            jax.ops.segment_max(jnp.where(elig_hi, lo_c, -1), hi_c,
                                num_segments=M))

        has_pos = comp_best >= tau
        parent = _contract(jnp.where(has_pos & (partner >= 0),
                                     jnp.maximum(partner, 0), comp_ids))
        dying = parent != comp_ids
        contrib = jnp.where(dying[:, None], cls_lp, 0.0)
        cls_lp = cls_lp.at[parent].add(contrib)
        size = size + jax.ops.segment_sum(
            jnp.where(dying, size, 0), parent, num_segments=M)
        cls_lp = jnp.where(dying[:, None], 0.0, cls_lp)
        size = jnp.where(dying, 0, size)

        ea = parent[ea]
        eb = parent[eb]
        total_map = parent[total_map]

        done = (~jnp.any(dying)) & (tau <= 0.0)
        return (ea, eb, total_map, cls_lp, size, frozen, done, rounds + 1)

    def cond(state):
        return (~state[-2]) & (state[-1] < max_rounds)

    state = (ea, eb, comp_ids, cls_lp, size, frozen,
             jnp.asarray(False), jnp.asarray(0))
    (ea, eb, total_map, cls_lp, size, frozen, _,
     rounds) = jax.lax.while_loop(cond, round_body, state)

    comp = _tgather(total_map, comp2d.reshape(-1)).reshape(H, W)
    return _finalize_components(comp, cls_lp, size, frozen, M, do_prune,
                                prune_threshold)


@jax.jit
def relabel_mask(label, root_class, is_instance_root):
    """Compact root labels into instance ids 1..K (0 = background).

    label: (H, W) component ids indexing into root_class (M,).
    Returns (mask (H, W) int32, inst_class (M,) int32) where
    inst_class[k-1] is the class of instance k (padded with -1)."""
    H, W = label.shape
    M = root_class.shape[0]
    inst_id = jnp.cumsum(is_instance_root.astype(jnp.int32))
    ids = jnp.where(is_instance_root, inst_id, 0)  # root -> 1..K
    mask = _tgather(ids, label.reshape(-1)).reshape(H, W)
    k = jnp.where(is_instance_root, inst_id - 1, M - 1)
    inst_class = jnp.full((M,), -1, jnp.int32)
    # scatter-max: non-instance slots write -1 into k = M-1, which must not
    # clobber a real instance that happens to land there (instance classes
    # are >= 1, so max resolves the collision correctly)
    inst_class = inst_class.at[k].max(
        jnp.where(is_instance_root, root_class,
                  jnp.full_like(root_class, -1)))
    return mask, inst_class





def _finalize_tables(cls_lp, size, frozen, M, do_prune, prune_threshold):
    """Table-level epilogue of every decode path: optional prune (fold
    weak components into the biggest background component, reference
    `segmenter.py:351-375`) + the instance-root mask; frozen
    (capacity-overflow) components fold to background rather than being
    emitted as fragments.  Returns (parent (M,) int32 or None when no
    prune relabel is needed, root_class (M,), is_instance_root (M,)) —
    the per-pixel apply is left to the caller so it can COMPOSE the
    table with its other relabels into one N-sized gather."""
    ids = jnp.arange(M, dtype=jnp.int32)
    root_class = jnp.argmax(cls_lp, axis=1).astype(jnp.int32)
    is_root = size > 0
    parent = None
    if do_prune:
        best_lp = jnp.max(cls_lp, axis=1)
        advantage = best_lp - cls_lp[:, 0]
        bg_size = jnp.where(is_root & (root_class == 0), size, -1)
        bg_root = jnp.argmax(bg_size).astype(jnp.int32)
        weak = is_root & (advantage < prune_threshold) & (ids != bg_root)
        parent = jnp.where(weak, bg_root, ids)
        root_class = jnp.where(weak, 0, root_class)
        is_root = is_root & ~weak
    is_instance_root = is_root & (root_class != 0) & ~frozen
    return parent, root_class, is_instance_root


def _finalize_components(comp, cls_lp, size, frozen, M, do_prune,
                         prune_threshold):
    """`_finalize_tables` + the per-pixel prune apply, for decode paths
    that already hold a pixel-level component plane."""
    parent, root_class, is_instance_root = _finalize_tables(
        cls_lp, size, frozen, M, do_prune, prune_threshold)
    if parent is not None:
        comp = parent[comp.reshape(-1)].reshape(comp.shape)
    return comp, root_class, is_instance_root



def _two_sum(a, b):
    """TwoSum-carry combiner for compensated associative scans."""
    ah, al = a
    bh, bl = b
    s = ah + bh
    z = s - ah
    e = (ah - (s - z)) + (bh - z)
    return (s, al + bl + e)


def _stable_cumsum(x, block=1024):
    """Running sum whose DIFFERENCES between nearby read-out points stay
    accurate at millions of elements.

    A flat float32 cumsum at E ~ 5M with totals ~1e6-1e7 accumulates
    rounding drift of order 1 between run boundaries — enough to flip the
    sign of near-zero merge priorities when `_pair_phase` differences
    consecutive run-end totals.  Blocking bounds each within-block partial
    to ~16k (per-add rounding ~1e-3), and the per-block bases come from a
    compensated (TwoSum-carry) scan over the few thousand block totals,
    so base differences are exact to ~1e-3 as well."""
    n = x.shape[0]
    nb = -(-n // block)
    xb = jnp.pad(x, (0, nb * block - n)).reshape(nb, block)
    within = jnp.cumsum(xb, axis=1)
    btot = within[:, -1]
    hi, lo = jax.lax.associative_scan(
        _two_sum, (btot, jnp.zeros_like(btot)))
    base = jnp.concatenate([jnp.zeros((1,), x.dtype), (hi + lo)[:-1]])
    return (base[:, None] + within).reshape(-1)[:n]


def _stable_cumsum_rows(x, block=1024):
    """Row-wise `_stable_cumsum`: independent compensated running sums
    along axis 1 of an (R, B) array (same accuracy argument)."""
    R, B = x.shape
    if B <= block:
        return jnp.cumsum(x, axis=1)
    nb = -(-B // block)
    xb = jnp.pad(x, ((0, 0), (0, nb * block - B))).reshape(R, nb, block)
    within = jnp.cumsum(xb, axis=2)
    btot = within[:, :, -1]
    hi, lo = jax.lax.associative_scan(
        _two_sum, (btot, jnp.zeros_like(btot)), axis=1)
    base = jnp.concatenate(
        [jnp.zeros((R, 1), x.dtype), (hi + lo)[:, :-1]], axis=1)
    return (base[:, :, None] + within).reshape(R, nb * block)[:, :B]


def _block_dedup(key, oml, P, SENT, pair_slots, block, slots):
    """Per-block pre-aggregated pair dedup (the packed fast path).

    Instead of one monolithic E-sized (key, oml) sort, reshape the E
    edges into rows of `block`, sort each row (batched sorts are ~2x the
    throughput of one monolithic sort on TPU), aggregate each row's
    parallel edges into per-(pair, row) partial sums, compact those to
    the first `slots` row slots with a second batched sort, and finish
    with ONE tiny global sort at R*slots entries (~160k vs 5.2M).  On
    trained 512x1024 outputs rows of 4096 raster-order edges touch <=20
    unique pairs (mean ~6), so `slots`=64 is ~3x headroom while cutting
    the dedup stage ~2.5x (docs/benchmarks.md).

    Capacity semantics (whole-pair drops, like the mono path's straddle
    rule): if any row holds more than `slots` unique pairs, the dropped
    runs are that row's LARGEST keys (rows are key-sorted), so every key
    >= T = min(dropped keys over all rows) is dropped globally — pairs
    either aggregate ALL their edges or never merge; no pair survives
    with partial (corrupted) evidence.  No overflow => T = sentinel =>
    exact.  Stats: `n_ext` and `edges_dropped` are EXACT (edges_dropped
    > 0 is the overflow-detection signal); the pair counts are exact
    with no overflow but UPPER BOUNDS under overflow — a dropped pair
    counts once per row it was row-dropped in (deduplicating them would
    need the global sort this path exists to avoid).

    Returns (plo, phi, pair_oml, stats) shaped (pair_slots,) like the
    mono dedup."""
    f32 = jnp.float32
    E = int(key.shape[0])
    R = -(-E // block)
    pad = R * block - E
    if pad:
        key = jnp.concatenate([key, jnp.full((pad,), SENT, key.dtype)])
        oml = jnp.concatenate([oml, jnp.zeros((pad,), oml.dtype)])
    # unstable sorts: XLA's stable sort carries an extra iota payload
    # array through every pass; none of these sorts needs stability (run
    # SUMS are order-independent up to compensated-cumsum rounding, and
    # the compaction orders are unique among kept entries)
    k2, o2 = jax.lax.sort((key.reshape(R, block), oml.reshape(R, block)),
                          dimension=1, num_keys=1, is_stable=False)
    dead = k2 >= SENT
    first = jnp.concatenate(
        [jnp.ones((R, 1), bool), k2[:, 1:] != k2[:, :-1]], axis=1)
    run_id = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
    tot = _stable_cumsum_rows(jnp.where(dead, 0.0, o2))
    last = jnp.concatenate(
        [first[:, 1:], jnp.ones((R, 1), bool)], axis=1)
    sel = last & ~dead
    # whole-pair drop threshold: min key whose run overflowed its row
    mindrop = jnp.min(jnp.where(first & ~dead & (run_id >= slots),
                                k2, SENT))
    ordkey = jnp.where(sel & (run_id < slots), run_id,
                       slots).astype(jnp.int32)
    ord_s, k_s, t_s = jax.lax.sort((ordkey, k2, tot), dimension=1,
                                   num_keys=1, is_stable=False)
    kept = ord_s[:, :slots] < slots
    t_sl = t_s[:, :slots]
    prev = jnp.concatenate(
        [jnp.zeros((R, 1), f32), t_sl[:, :-1]], axis=1)
    pk = jnp.where(kept, k_s[:, :slots], SENT).reshape(-1)
    pt = jnp.where(kept, t_sl - prev, 0.0).reshape(-1)

    plo, phi, pair_oml, pairs_kept, pairs_cut = _dedup_global_finish(
        pk, pt, P, SENT, pair_slots, mindrop)

    n_ext = jnp.sum((~dead).astype(jnp.int32))
    edges_dropped = jnp.sum((~dead & (k2 >= mindrop)).astype(jnp.int32))
    # upper-bound dropped-pair count: runs cut at row level (once per
    # row) + globally-visible runs past the threshold + clamp overflow
    rowdrop = jnp.sum((first & ~dead & (run_id >= slots))
                      .astype(jnp.int32))
    pairs_dropped = (rowdrop + pairs_cut + jnp.maximum(
        pairs_kept - (pair_slots - 1), 0)).astype(jnp.int32)
    stats = {
        "n_ext": n_ext,
        "edges_dropped": edges_dropped,
        "pairs_total": pairs_kept + pairs_dropped,
        "pairs_dropped": pairs_dropped,
    }
    return plo, phi, pair_oml, stats


def _dedup_global_finish(pk, pt, P, SENT, pair_slots, mindrop):
    """Global merge of per-row partial (pair key, partial oml sum)
    entries: one small sort, run-differenced running sum, compaction to
    `pair_slots` — the shared tail of `_block_dedup` and `_run_dedup`.
    Entries with key >= `mindrop` (sentinels AND threshold-dropped
    pairs) are zeroed out of the aggregation.  Returns (plo, phi,
    pair_oml, pairs_kept, pairs_cut); `pairs_cut` counts unique keys
    dropped by the threshold (below SENT, at/over mindrop)."""
    f32 = jnp.float32
    if pk.shape[0] < pair_slots:  # outputs slice to pair_slots entries
        padn = pair_slots - pk.shape[0]
        pk = jnp.concatenate([pk, jnp.full((padn,), SENT, pk.dtype)])
        pt = jnp.concatenate([pt, jnp.zeros((padn,), pt.dtype)])
    gk, gt = jax.lax.sort((pk, pt), num_keys=1, is_stable=False)
    gdead = gk >= mindrop
    gfirst = jnp.concatenate([jnp.ones((1,), bool), gk[1:] != gk[:-1]])
    # number KEPT runs contiguously (dropped runs sit between kept ones
    # in key order, so the raw run index would leave gaps and mis-clamp
    # against pair_slots)
    krun = (jnp.cumsum((gfirst & ~gdead).astype(jnp.int32)) - 1) \
        .astype(jnp.int32)
    gtot = _stable_cumsum(jnp.where(gdead, 0.0, gt))
    glast = jnp.concatenate([gfirst[1:], jnp.ones((1,), bool)])
    gsel = glast & ~gdead & (krun < pair_slots - 1)
    gord = jnp.where(gsel, krun, pair_slots - 1)
    os_, pk_s, tot_s = jax.lax.sort((gord, gk, gtot), num_keys=1,
                                    is_stable=False)
    valid = os_[:pair_slots] < pair_slots - 1
    plo = jnp.where(valid, pk_s[:pair_slots] // P, -1)
    phi = jnp.where(valid, pk_s[:pair_slots] % P, -1)
    ctot = tot_s[:pair_slots]
    pair_oml = jnp.where(
        valid, ctot - jnp.concatenate([jnp.zeros((1,), f32), ctot[:-1]]),
        0.0)
    pairs_kept = jnp.sum((gfirst & ~gdead).astype(jnp.int32))
    pairs_cut = jnp.sum((gfirst & (gk < SENT) & gdead).astype(jnp.int32))
    return plo, phi, pair_oml, pairs_kept, pairs_cut


def _dedup_rows(keyT, omlT, H, SENT, block):
    """Row-blocked COLUMN-major edge layout shared by `_run_dedup` (which
    needs it) and the `_block_dedup` fallback (which is order-agnostic).
    keyT/omlT are (O, W, H) per-offset planes of the TRANSPOSED grid.
    Rows are column-aligned (B a multiple of H, pad rows carry sentinel
    keys), so every run lies inside one row.  Returns (key (R, B),
    oml (R, B), first (R, B) run-start flags, dead (R, B))."""
    O, W, _ = keyT.shape
    B = H * max(1, int(block) // H)
    E = O * W * H
    R = -(-E // B)
    key = keyT.reshape(-1)
    oml = omlT.reshape(-1)
    pad = R * B - E
    if pad:
        key = jnp.concatenate([key, jnp.full((pad,), SENT, key.dtype)])
        oml = jnp.concatenate([oml, jnp.zeros((pad,), oml.dtype)])
    key = key.reshape(R, B)
    oml = oml.reshape(R, B)
    # a run starts at every column boundary (offset planes are whole
    # numbers of columns, so plane boundaries coincide) or key change
    col0 = (jnp.arange(B, dtype=jnp.int32) % H) == 0
    first = col0[None, :] | jnp.concatenate(
        [jnp.ones((R, 1), bool), key[:, 1:] != key[:, :-1]], axis=1)
    dead = key >= SENT
    return key, oml, first, dead


def _run_dedup(key, oml, first, dead, P, SENT, pair_slots, slots):
    """Run-granular pair dedup — the sort1-free fast path of
    `_block_dedup` (docs/benchmarks.md, round 4).

    In column-major order equal pair keys are ALREADY contiguous: a key
    plane's runs are intersections of the component grid's column runs
    with its shifted self's, so the per-block key sort that
    `_block_dedup` uses to group equal keys is unnecessary — run
    detection is an adjacency compare, per-run oml sums are row-cumsum
    differences at run ends, and ONE 2-int (ordkey, idx) sort compacts
    the <= `slots` LIVE (external) run ends per row; key/total ride as
    two small take_along_axis gathers instead of sort payloads.  The
    global finish merges the same pair's runs across rows/offsets
    exactly like `_block_dedup`'s.

    CAPACITY CONTRACT (differs from `_block_dedup`): rows bound LIVE
    RUNS, not unique pairs, and this path never drops anything — the
    caller lax.conds to the sorted `_block_dedup` when any row's live
    run count exceeds `slots` (`_pair_phase`), so reaching here means
    the aggregation is exact and edges_dropped = 0."""
    R, B = key.shape
    livestart = first & ~dead
    rid = jnp.cumsum(livestart.astype(jnp.int32), axis=1) - 1
    last = jnp.concatenate([first[:, 1:], jnp.ones((R, 1), bool)],
                           axis=1)
    sel = last & ~dead
    tot = _stable_cumsum_rows(jnp.where(dead, 0.0, oml))
    ordkey = jnp.where(sel & (rid < slots), rid, slots).astype(jnp.int32)
    # key/total ride the compaction sort as PAYLOADS: two (R, slots)
    # take_along_axis gathers from the (R, B) arrays cost ~3.3 ms EACH at
    # B=4096 (XLA's slow gather path, xprof round 5) while the extra
    # payload arrays add ~0.5 ms to the unstable sort — kept ordkeys are
    # unique per row, so payload order is deterministic where it matters
    ord_s, k_sf, t_sf = jax.lax.sort((ordkey, key, tot), dimension=1,
                                     num_keys=1, is_stable=False)
    kept = ord_s[:, :slots] < slots
    k_s = k_sf[:, :slots]
    t_sl = t_sf[:, :slots]
    # kept entries sort first and in run order, so differencing
    # consecutive compacted totals yields exact per-run sums (dead runs
    # between two live ends contribute 0 to the cumsum)
    prev = jnp.concatenate(
        [jnp.zeros((R, 1), jnp.float32), t_sl[:, :-1]], axis=1)
    pk = jnp.where(kept, k_s, SENT).reshape(-1)
    pt = jnp.where(kept, t_sl - prev, 0.0).reshape(-1)

    plo, phi, pair_oml, pairs_kept, pairs_cut = _dedup_global_finish(
        pk, pt, P, SENT, pair_slots, SENT)
    clamp = jnp.maximum(pairs_kept - (pair_slots - 1), 0)
    pairs_dropped = (pairs_cut + clamp).astype(jnp.int32)
    stats = {
        "n_ext": jnp.sum((~dead).astype(jnp.int32)),
        "edges_dropped": jnp.asarray(0, jnp.int32),
        "pairs_total": pairs_kept + pairs_dropped,
        "pairs_dropped": pairs_dropped,
    }
    return plo, phi, pair_oml, stats


def _pair_phase(comp2d, cls_lp, size, frozen, log_odds, offsets, M2,
                pair_slots, pair_rounds, den_mode, omf, bias, packed,
                edge_slots=None, dedup_block=None, dedup_slots=64,
                froz2d=None, anneal_start=0.0, anneal_halvings=0):
    """Pair dedup + aggregated Boruvka rounds (decode_hierarchical stages
    3-4; docs/decoder.md).

    comp2d: (H, W) int32 dense ids in [0, M2); cls_lp (M2, C); size (M2,);
    frozen (M2,) bool.  `packed` (static) selects int32 pair-key packing
    (requires (M2+1)^2-1 <= 2^31-1) or (lo, hi) 2-key sorts for larger
    component spaces (the exact-oracle path).

    edge_slots (static): stream-compaction capacity.  After flood +
    absorption only a few percent of the H*W*O (pixel, offset) edges are
    external (~216k of 5.2M at 512x1024 on trained outputs), but the
    dedup previously ran BOTH its big sorts at full edge count.  The key
    sort itself is the compaction: internal edges carry the sentinel key,
    which sorts to the tail, so slicing the sorted arrays to K =
    edge_slots keeps every external edge (when n_ext <= K) and the
    running sum + the run-compaction sort shrink from E to K.  (A top_k
    pre-compaction was measured SLOWER than the sort it saved: 29 ms at
    E=5.2M/K=512k vs the 15 ms 2-array sort — docs/benchmarks.md.)
    Edges beyond K are dropped (largest pair keys first).  A pair whose
    edge run STRADDLES the K boundary is dropped WHOLE — a partial run
    would aggregate corrupted (truncated) oml evidence; a pair whose run
    ends exactly at K is complete and kept.  Dropped pairs never merge;
    their components are still emitted.  The caller sees the total
    dropped-edge count in `stats` and can fall back to an exact mode.

    Returns (total_map (M2,), cls_lp, size, stats) with total_map mapping
    input dense ids to surviving roots and stats a dict of int32 scalars:
    n_ext (external edges), edges_dropped (beyond edge_slots),
    pairs_total (unique component pairs among kept edges), pairs_dropped
    (beyond the USABLE capacity pair_slots - 1 — the last slot is the
    overflow clamp)."""
    f32 = jnp.float32
    P = M2 + 1
    SENT = P * P - 1 if packed else None  # > any real key; int32-safe
    if froz2d is None:  # callers may pass it pre-fused into a relabel
        froz2d = frozen[comp2d]
    if packed and dedup_block is not None:
        # per-block pre-aggregated dedup (serving fast path); edge_slots
        # compaction is the mono path's mechanism — mutually exclusive
        assert edge_slots is None, \
            "dedup_block and edge_slots are mutually exclusive"
        # COLUMN-major key planes: on the transposed grid offset (di, dj)
        # becomes (dj, di), and equal pair keys land contiguous in the
        # flattened (O, W, H) layout — the run-granular `_run_dedup`
        # fast path needs no per-block key sort at all.  Falls back to
        # the sorted `_block_dedup` (order-agnostic, so it takes the
        # same column-major input) when any row's live run count
        # exceeds `dedup_slots` — the fallback's own unique-pair
        # capacity semantics then apply.
        compT = comp2d.T
        frozT = froz2d.T
        keysT = []
        for oi, (di, dj) in enumerate(offsets):
            c2 = _shift2d(compT, dj, di, -1)
            f2 = _shift2d(frozT, dj, di, True)
            ext = (c2 >= 0) & (c2 != compT) & ~frozT & ~f2
            lo = jnp.minimum(compT, c2)
            hi = jnp.maximum(compT, c2)
            keysT.append(jnp.where(ext, lo * P + hi, SENT))
        keyT = jnp.stack(keysT)                  # (O, W, H)
        omlT = log_odds.transpose(0, 2, 1)       # (O, W, H)
        H2 = comp2d.shape[0]
        keyr, omlr, firstr, deadr = _dedup_rows(keyT, omlT, H2, SENT,
                                                int(dedup_block))
        nlive = jnp.max(jnp.sum((firstr & ~deadr).astype(jnp.int32),
                                axis=1))
        plo, phi, pair_oml, stats = jax.lax.cond(
            nlive <= int(dedup_slots),
            lambda _: _run_dedup(keyr, omlr, firstr, deadr, P, SENT,
                                 pair_slots, int(dedup_slots)),
            lambda _: _block_dedup(keyT.reshape(-1), omlT.reshape(-1),
                                   P, SENT, pair_slots,
                                   int(dedup_block), int(dedup_slots)),
            operand=None)
        return _pair_rounds(plo, phi, pair_oml, stats, cls_lp, size,
                            frozen, M2, P, SENT, pair_slots, pair_rounds,
                            den_mode, omf, bias, packed,
                            anneal_start, anneal_halvings)
    los, his, keys, omls = [], [], [], []
    for oi, (di, dj) in enumerate(offsets):
        c2 = _shift2d(comp2d, di, dj, -1)
        f2 = _shift2d(froz2d, di, dj, True)
        ext = (c2 >= 0) & (c2 != comp2d) & ~froz2d & ~f2
        lo = jnp.minimum(comp2d, c2)
        hi = jnp.maximum(comp2d, c2)
        if packed:
            keys.append(jnp.where(ext, lo * P + hi, SENT).reshape(-1))
        else:
            los.append(jnp.where(ext, lo, M2).reshape(-1))
            his.append(jnp.where(ext, hi, M2).reshape(-1))
    # plane-major log_odds flattens to exactly the per-offset concat order
    oml = log_odds.reshape(-1)
    if packed:
        key = jnp.concatenate(keys)
        ext_mask = key < SENT
    else:
        lo_all = jnp.concatenate(los)
        hi_all = jnp.concatenate(his)
        ext_mask = lo_all < M2
    E_all = int(oml.shape[0])
    K = E_all if edge_slots is None else min(int(edge_slots), E_all)
    n_ext = jnp.sum(ext_mask.astype(jnp.int32))
    edges_dropped = jnp.maximum(n_ext - K, 0)
    # the key sort doubles as the stream compaction: sentinel (internal)
    # keys sort to the tail, so [:K] keeps all external edges when
    # n_ext <= K and every downstream op runs at K instead of E
    if packed:
        key_s, oml_s = jax.lax.sort((key, oml), num_keys=1)
        # a pair whose edge run STRADDLES the K boundary (same key on
        # both sides of the cut) would otherwise keep a PARTIAL oml sum
        # (corrupted aggregated evidence); drop the whole boundary pair.
        # A pair whose run ends exactly at K is complete and is kept —
        # the straddle test needs the pre-slice key at index K.
        straddles = (key_s[K] == key_s[K - 1]) if K < E_all \
            else jnp.asarray(False)
        key_s, oml_s = key_s[:K], oml_s[:K]
        dead_s = key_s >= SENT
        cut = straddles & (key_s == key_s[-1]) & ~dead_s
        dead_s = dead_s | cut
        first = jnp.concatenate([jnp.ones((1,), bool),
                                 key_s[1:] != key_s[:-1]])
    else:
        lo_s, hi_s, oml_s = jax.lax.sort((lo_all, hi_all, oml), num_keys=2)
        straddles = ((lo_s[K] == lo_s[K - 1]) & (hi_s[K] == hi_s[K - 1])) \
            if K < E_all else jnp.asarray(False)
        lo_s, hi_s, oml_s = lo_s[:K], hi_s[:K], oml_s[:K]
        dead_s = lo_s >= M2
        cut = (straddles & (lo_s == lo_s[-1]) & (hi_s == hi_s[-1])
               & ~dead_s)
        dead_s = dead_s | cut
        first = jnp.concatenate([
            jnp.ones((1,), bool),
            (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])])
    edges_dropped = edges_dropped + jnp.sum(cut.astype(jnp.int32))
    # run detection must NOT mask the sentinel block: masking would fold
    # the sentinels (internal edges) into the last real pair's run and
    # poison its aggregate with interior log-odds
    run_id = (jnp.cumsum(first.astype(jnp.int32)) - 1).astype(jnp.int32)
    # Per-run sums, scatter-free (the straightforward segment_sum +
    # scatter into pair slots costs ~90 ms at 5.2M edges on v5e — XLA
    # lowers both as slow scatters): take the GLOBAL running sum of the
    # (sentinel-zeroed) sorted omls, compact the run-END entries in run
    # order with one more sort, and difference consecutive compacted
    # totals — real runs are contiguous in the sorted order (sentinels
    # form the tail), so total[end_j] - total[end_{j-1}] is exactly run
    # j's sum.
    total = _stable_cumsum(jnp.where(dead_s, 0.0, oml_s))
    last = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
    sel = last & ~dead_s & (run_id < pair_slots - 1)
    ordkey = jnp.where(sel, run_id, pair_slots - 1)
    if packed:
        ord_s, pk_s, tot_s = jax.lax.sort((ordkey, key_s, total),
                                          num_keys=1)
        valid = ord_s[:pair_slots] < pair_slots - 1
        plo = jnp.where(valid, pk_s[:pair_slots] // P, -1)
        phi = jnp.where(valid, pk_s[:pair_slots] % P, -1)
    else:
        ord_s, plo_s, phi_s, tot_s = jax.lax.sort(
            (ordkey, lo_s, hi_s, total), num_keys=1)
        valid = ord_s[:pair_slots] < pair_slots - 1
        plo = jnp.where(valid, plo_s[:pair_slots], -1)
        phi = jnp.where(valid, phi_s[:pair_slots], -1)
    ctot = tot_s[:pair_slots]
    pair_oml = jnp.where(
        valid, ctot - jnp.concatenate([jnp.zeros((1,), f32), ctot[:-1]]),
        0.0)
    pairs_total = jnp.sum((first & ~dead_s).astype(jnp.int32))
    stats = {
        "n_ext": n_ext,
        "edges_dropped": edges_dropped,
        "pairs_total": pairs_total,
        "pairs_dropped": jnp.maximum(
            pairs_total - (pair_slots - 1), 0).astype(jnp.int32),
    }

    return _pair_rounds(plo, phi, pair_oml, stats, cls_lp, size, frozen,
                        M2, P, SENT, pair_slots, pair_rounds, den_mode,
                        omf, bias, packed, anneal_start, anneal_halvings)


def _pair_rounds(plo, phi, pair_oml, stats, cls_lp, size, frozen, M2, P,
                 SENT, pair_slots, pair_rounds, den_mode, omf, bias,
                 packed, anneal_start=0.0, anneal_halvings=0):
    """Aggregated Boruvka rounds over the deduped unique-pair arrays
    (shared by the mono and block dedup paths).

    anneal_start / anneal_halvings: greedy-ORDER emulation — round r
    only applies hooks whose component-best priority is >= tau_r (0
    after anneal_halvings rounds), so low-priority merges are deferred
    until the components they link have grown and their aggregated pair
    evidence is decisive, like the serial greedy's global best-first
    heap.  tau_r is the fixed sweep anneal_start * 0.5^r while that is
    attainable (<= the round's best positive priority maxpri_r), else
    maxpri_r / 2 — so a scene whose hyperparameters produce priorities
    far below anneal_start still anneals (ordering the top half of what
    exists) instead of wasting its halvings above the whole priority
    range, and every annealed round applies at least the best merge.
    Schedule selection measured on a 50-image 512x1024 trained-output
    sweep + synthetic oracle scenes
    (tests/fixtures/certification512/exact_anneal_r4.json,
    docs/decoder.md): plain rounds = -3.0 AP vs the C++ greedy;
    fixed-8.0/8 = +2.0 AP but loses oracle scenes whose priority scale
    is ~0.2; pure maxpri-tracking = scale-free but never orders the
    weak-seam band (-0.8 AP); min(fixed, maxpri/2) every round = +0.6;
    this attainability form keeps the full +2.0 on the sweep AND the
    oracle scenes.  Default 0/0 = plain rounds (every non-negative hook
    applies immediately)."""
    f32 = jnp.float32
    ids2 = jnp.arange(M2, dtype=jnp.int32)

    def pair_round(state):
        plo, phi, poml, total_map, cls_lp, size, _, r = state
        live = (plo >= 0) & (plo != phi) & ~frozen[jnp.maximum(plo, 0)] \
            & ~frozen[jnp.maximum(phi, 0)]
        if packed:
            k = jnp.where(live, plo * P + phi, SENT)
            k_s, o_s = jax.lax.sort((k, poml), num_keys=1)
            dead = k_s >= SENT
            lo_c = jnp.minimum(k_s // P, M2 - 1)
            hi_c = jnp.minimum(k_s % P, M2 - 1)
            f_ = jnp.concatenate([jnp.ones((1,), bool),
                                  k_s[1:] != k_s[:-1]])
        else:
            lo_k = jnp.where(live, plo, M2)
            hi_k = jnp.where(live, phi, M2)
            lo_s, hi_s, o_s = jax.lax.sort((lo_k, hi_k, poml), num_keys=2)
            dead = lo_s >= M2
            lo_c = jnp.minimum(lo_s, M2 - 1)
            hi_c = jnp.minimum(hi_s, M2 - 1)
            f_ = jnp.concatenate([
                jnp.ones((1,), bool),
                (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])])
        rid = (jnp.cumsum(f_.astype(jnp.int32)) - 1).astype(jnp.int32)
        agg = jax.ops.segment_sum(o_s, rid, num_segments=pair_slots,
                                  indices_are_sorted=True)[rid]
        best_lp = jnp.max(cls_lp, axis=1)
        joint = cls_lp[lo_c] + cls_lp[hi_c]
        cdl = jnp.max(joint, axis=1) - best_lp[lo_c] - best_lp[hi_c]
        n1 = size[lo_c].astype(f32)
        n2 = size[hi_c].astype(f32)
        if den_mode == "sum":
            pri = (agg * omf + cdl) / (n1 + n2) + bias
        else:
            pri = (agg * omf + cdl + bias) / (n1 * n2)
        pri = jnp.where(dead, NEG_INF, pri)

        # UP-SIZE hooking only (see the absorption stage): lo may hook to
        # hi only when hi is (size, id)-greater, and vice versa — chains
        # through shared small partners cannot bridge two large comps.
        hi_up = (n2 > n1) | ((n2 == n1) & (hi_c > lo_c))
        pri_lo = jnp.where(hi_up, pri, NEG_INF)
        pri_hi = jnp.where(~hi_up, pri, NEG_INF)
        comp_best = jnp.maximum(
            jax.ops.segment_max(pri_lo, lo_c, num_segments=M2),
            jax.ops.segment_max(pri_hi, hi_c, num_segments=M2))
        comp_best = jnp.where(jnp.isfinite(comp_best), comp_best, NEG_INF)
        if not anneal_halvings:
            tau = f32(0.0)
        else:
            maxpri = jnp.maximum(
                jnp.max(jnp.where(jnp.isfinite(comp_best),
                                  comp_best, 0.0)), 0.0)
            fixed = f32(anneal_start) * jnp.exp2(-r.astype(f32))
            # fixed schedule while attainable; when it sits above the
            # scene's whole priority range (a wasted round otherwise),
            # order the top half of what actually exists instead
            tau = jnp.where(r < anneal_halvings,
                            jnp.where(fixed <= maxpri, fixed,
                                      0.5 * maxpri),
                            f32(0.0))
        elig_lo = (pri_lo == comp_best[lo_c]) & ~dead & hi_up
        elig_hi = (pri_hi == comp_best[hi_c]) & ~dead & ~hi_up
        partner = jnp.maximum(
            jax.ops.segment_max(jnp.where(elig_lo, hi_c, -1), lo_c,
                                num_segments=M2),
            jax.ops.segment_max(jnp.where(elig_hi, lo_c, -1), hi_c,
                                num_segments=M2))
        # early-exit while_loop (nested in the round loop): unroll=True
        # emitted ceil(log2 M2) = 13 pointer-jump gathers at ~0.14 ms
        # each PER ROUND (~1.8 ms, xprof round 5); real pair forests
        # resolve in 2-3 jumps under up-size hooking
        parent = _contract(jnp.where((comp_best >= tau) & (partner >= 0),
                                     jnp.maximum(partner, 0), ids2))
        dying = parent != ids2
        cls_lp = cls_lp.at[parent].add(
            jnp.where(dying[:, None], cls_lp, 0.0))
        cls_lp = jnp.where(dying[:, None], 0.0, cls_lp)
        size = size + jax.ops.segment_sum(jnp.where(dying, size, 0),
                                          parent, num_segments=M2)
        size = jnp.where(dying, 0, size)
        # contract the (sorted) pair arrays for the next round
        nlo = parent[lo_c]
        nhi = parent[hi_c]
        nlo, nhi = jnp.minimum(nlo, nhi), jnp.maximum(nlo, nhi)
        nlo = jnp.where(dead, -1, nlo)
        nhi = jnp.where(dead, -1, nhi)
        total_map = parent[total_map]
        done = (~jnp.any(dying)) & (tau <= 0.0)
        return (nlo, nhi, o_s, total_map, cls_lp, size, done, r + 1)

    state = (plo, phi, pair_oml, ids2, cls_lp, size,
             jnp.asarray(False), jnp.asarray(0))
    (_, _, _, total_map, cls_lp, size, _, _) = jax.lax.while_loop(
        lambda s: (~s[-2]) & (s[-1] < pair_rounds), pair_round, state)
    return total_map, cls_lp, size, stats


@functools.partial(
    jax.jit,
    static_argnames=("num_classes", "offsets", "den_mode",
                     "same_different_bias", "object_merge_factor",
                     "merge_logprob_bias", "ccl_sweeps", "ccl_margin",
                     "absorb_thetas", "absorb_size_cap", "max_components",
                     "pair_components", "pair_slots", "pair_rounds",
                     "edge_slots", "dedup_block", "dedup_slots",
                     "do_prune", "prune_threshold", "return_stats",
                     "relabel", "from_logits"))
def decode_hierarchical(class_probs, sameness_probs, num_classes, offsets,
                        same_different_bias=0.0, object_merge_factor=1.0,
                        merge_logprob_bias=0.0, den_mode="sum",
                        ccl_sweeps=3, ccl_margin=2.0,
                        absorb_thetas=(1.0,),
                        absorb_size_cap=64,
                        max_components=65536, pair_components=8192,
                        pair_slots=16384, pair_rounds=64,
                        edge_slots=None, dedup_block=4096, dedup_slots=256,
                        do_prune=False, prune_threshold=200.0,
                        return_stats=False, relabel=False,
                        from_logits=False):
    """Single-dispatch hierarchical decode tuned for serving throughput.

    Same objective as `decode_on_device`, structured so every stage's cost
    matches how much unresolved structure is actually left:

      1. conservative flood fill (`_flood_fill`, margin + erosion guard):
         collapses high-confidence same-class interiors with segmented
         scans; fuzzy boundary rings stay out.
      2. absorption rounds on the label GRID (no edge materialization):
         τ-annealed Boruvka rounds that merge a pair only when (a) both
         sides share an argmax class (class delta exactly 0), (b) the
         SMALLER side is below `absorb_size_cap` pixels, and (c) the best
         single linking edge has log-odds >= θ.  Small fragments and
         boundary rings absorb into their cores; merges between two LARGE
         components — where single-edge evidence can contradict the
         aggregated pair evidence (the fuzzy-seam failure mode) — are
         deliberately excluded and left to stage 4.
      3. pair dedup: ONE packed int32 key sort doubles as the stream
         compaction (internal edges carry the sentinel key and sort to
         the tail; the sorted arrays are sliced to `edge_slots`), then
         run-differencing of a compensated running sum collapses parallel
         edges into unique component pairs with summed object-merge
         logprob (~30x fewer unique pairs than external edges on trained
         outputs).  See `_pair_phase` for the capacity-overflow policy.
      4. aggregated Boruvka pair rounds on the compact unique-pair arrays —
         the exact merge priority ((Σoml·f + cdl)/den + bias, reference
         `segment.cc:145-150`) drives hook/contract to the same "no
         non-negative-priority merge remains" fixed point as the greedy.

    Capacity overflow: COMPONENTS beyond `max_components`/
    `pair_components` freeze — they never merge and fold into background
    at output (under-segmentation beats garbage instances).  EDGES beyond
    `edge_slots` and unique PAIRS beyond `pair_slots - 1` (one slot is
    reserved as the overflow clamp) are dropped: the affected components
    stop merging but are still emitted (possibly fragmented).  Every
    overflow is counted; pass `return_stats=True` to
    get a dict of int32 scalars (n_ext, edges_dropped, pairs_total,
    pairs_dropped, n_frozen) as a 4th output so serving can detect an
    over-budget scene and fall back to the exact mode
    (`run_segmentation_device`).  Capacities are pure budgets: below them
    the result is bit-identical to unbounded capacities.  The defaults
    are sized for NATIVE 512x1024 trained outputs, where long fuzzy
    boundaries under the far offsets make most of the edge mass external:
    measured n_ext 1.7-2.0M (vs edge_slots 2.56M) with only ~10-130
    unique pairs (vs pair_slots 16k) on the certification val set.
    (Round-2's 512k edge budget was sized on upscaled-from-256x512
    fixtures with n_ext ~216k and silently dropped ~70% of the edges at
    native resolution — AP 0.0005; the certification pipeline exists to
    catch exactly this.)

    The DEFAULTS are the certified serving configuration: mask-AP parity
    with the C++ greedy (measured ahead) on trained PSPFPNet outputs
    over the synthetic-street val set at the reference 512x1024 decode
    size — the current multi-seed numbers live in docs/benchmarks.md and
    are gated in-repo by tests/test_decoder_certification.py.

    Returns (comp (H, W) int32, root_class (M2,), is_instance_root (M2,))
    — same contract as `decode_on_device`; feed to `relabel_mask`.
    With `relabel=True` the relabel is fused into the final gather and
    the return is (mask (H, W) int32 with instance ids 1..K,
    inst_class (M2,) int32) — identical to calling `relabel_mask` on the
    default outputs, one N-sized gather cheaper (serving path).

    With `from_logits=True`, `class_probs`/`sameness_probs` are the
    net's raw LOGITS and the sigmoid -> log round trip is collapsed
    algebraically (see `_log_domain`) — the serving/e2e fast path.
    """
    H, W, C = class_probs.shape
    assert C == num_classes and sameness_probs.shape[-1] == len(offsets)
    N = H * W
    M = min(max_components, N)
    M2 = min(pair_components, M)
    # pair keys pack as lo*(M2+1)+hi in int32; beyond this the packing
    # silently overflows, so fail loudly instead
    assert (M2 + 1) * (M2 + 1) - 1 <= 2 ** 31 - 1, \
        "pair_components must be <= 46339 (int32 pair-key packing)"
    f32 = jnp.float32
    omf = f32(object_merge_factor)
    bias = f32(merge_logprob_bias)
    cls_lp_pix, log_odds = _log_domain(class_probs, sameness_probs,
                                       same_different_bias,
                                       from_logits=from_logits)
    argmax_pix = jnp.argmax(cls_lp_pix, axis=-1)

    # ---- stage 1: flood + densify to M ----
    label = _flood_fill(argmax_pix, log_odds, offsets, den_mode, omf, bias,
                        ccl_sweeps, ccl_margin)
    comp2d, cls_lp, size, frozen, n_comp_total, runs = _densify_stats(
        label, cls_lp_pix, M, return_runs=True)
    comp_c = runs[1]  # stage-1 dense ids at the run ends

    # ---- stage 2: absorption rounds on the grid ----
    ids = jnp.arange(M, dtype=jnp.int32)
    # prefix bound for the component-table work: stage-1 dense ids are
    # contiguous, so when n_comp_total fits SMALL every M-sized
    # contract/scatter/segment op runs on the [:SMALL] slice instead
    # (lax.cond; identical outputs — slots past n_comp_total are zero
    # and unreferenced).  Trained 512x1024 certification scenes measure
    # n_comp_total 5.0-12.4k after the flood, so 16384 covers them all
    # (a pointer-jump gather costs ~0.14/0.29/0.58 ms at 8k/16k/65k)
    SMALL = min(16384, M)
    pack_stats = num_classes <= 16  # argcls in 4 bits, size < 2^26
    if pack_stats and absorb_thetas:
        from ..ops.pallas.absorb import absorb_best_edges, \
            absorb_scan_supported
        use_pallas = absorb_scan_supported(H, W)
    else:
        use_pallas = False
    # N-sized gathers dominate the decode cost (XLA lowers each to a
    # ~3.7 ms scalar loop at 512x1024 — profiled, docs/benchmarks.md), so
    # per-pixel relabels are COMPOSED AT TABLE LEVEL (M-sized, cheap) and
    # applied in one gather: `tparent` accumulates the absorb rounds'
    # parent maps; stage 3 composes it with the dense remap and the
    # frozen flag, so absorb + re-densify + frozen lookup cost ONE
    # N-sized gather total instead of three.
    comp2d_s1 = comp2d  # stage-1 dense ids (the Pallas scan's labels)
    tparent = None      # (M,) stage-1 id -> current absorb root
    for theta in absorb_thetas:
        # current ids at the run ends (tables compose at G granularity)
        comp_cur_c = comp_c if tparent is None else tparent[comp_c]
        if tparent is not None:
            comp2d = _run_apply(tparent, comp_c, comp2d_s1, runs)
        argcls = jnp.argmax(cls_lp, axis=1).astype(jnp.int32)
        if pack_stats:
            # one run-granular apply instead of three per-pixel gathers:
            # (size, argcls, frozen) packed into a single int32
            packed = ((jnp.minimum(size, (1 << 26) - 1) << 5)
                      | (argcls << 1) | frozen.astype(jnp.int32))
            packed_own = _run_apply(packed, comp_cur_c, comp2d_s1, runs)
            arg_own = (packed_own >> 1) & 15
            size_own = packed_own >> 5
            froz_own = (packed_own & 1) == 1
        else:
            arg_own = argcls[comp2d]
            size_own = size[comp2d]
            froz_own = frozen[comp2d]
        if use_pallas:
            # fused Pallas scan: full grids resident in VMEM, one pass
            # over all offsets/directions (ops/pallas/absorb.py;
            # bit-identical to the jnp loop below)
            best_pri, best_partner = absorb_best_edges(
                comp2d, packed_own, log_odds, offsets, float(theta),
                absorb_size_cap)
            plane_offsets = ()
        else:
            best_pri = jnp.full((H, W), NEG_INF, f32)
            best_partner = jnp.full((H, W), -1, jnp.int32)
            plane_offsets = offsets
        for oi, (di, dj) in enumerate(plane_offsets):
            nbr = _shift2d(comp2d, di, dj, -1)
            arg_nbr = _shift2d(arg_own, di, dj, -2)
            size_nbr = _shift2d(size_own, di, dj, 0)
            froz_nbr = _shift2d(froz_own, di, dj, True)
            oml = log_odds[oi]
            small = jnp.minimum(size_own, size_nbr)
            ok = ((nbr >= 0) & (nbr != comp2d) & (arg_nbr == arg_own) &
                  (small <= absorb_size_cap) & (oml >= theta) &
                  ~froz_own & ~froz_nbr)
            # UP-SIZE hooking only ((size, id) lexicographic): every
            # hooking tree is rooted at its largest member, so two large
            # components can never be chain-merged through a shared small
            # fragment in one round — the failure mode that fuses
            # well-separated objects through fuzzy boundary rings.
            up_fwd = (size_nbr > size_own) | ((size_nbr == size_own) &
                                              (nbr > comp2d))
            # rank eligible edges by their evidence; the exact priority is
            # re-derived from aggregated stats in stage 4 — absorption only
            # needs a confident same-class link
            pri_f = jnp.where(ok & up_fwd, oml, NEG_INF)
            pri_b = jnp.where(ok & ~up_fwd, oml, NEG_INF)
            for p, q in ((pri_f, nbr),
                         (_shift2d(pri_b, -di, -dj, NEG_INF),
                          _shift2d(comp2d, -di, -dj, -1))):
                take = (p > best_pri) | ((p == best_pri) &
                                         (q > best_partner))
                best_pri = jnp.where(take, p, best_pri)
                best_partner = jnp.where(take, q, best_partner)
        bp = best_pri.reshape(-1)
        own_f = comp2d.reshape(-1)
        partner_f = best_partner.reshape(-1)
        # ONE per-pixel segment_max instead of two (measured 7 ms each at
        # N=512k): pack (quantized pri, partner+1) into an int32.  Every
        # eligible edge has pri = oml in [theta, ~16] (`ok` requires
        # oml >= theta; log-odds are eps-clipped to ~15.9), so the
        # quantization keeps ~1e-3 resolution at the default M; pri ties
        # within one quantum resolve to the larger partner id (the exact
        # policy broke pri ties the same way — re-certified by AP gates).
        partner_bits = max(1, int(np.ceil(np.log2(M + 2))))
        q_levels = (1 << (31 - partner_bits)) - 1
        if q_levels >= 255:
            q = jnp.clip((bp - f32(theta)) * f32(q_levels / 16.0),
                         0, q_levels - 1).astype(jnp.int32) + 1
            packed_edge = jnp.where(
                (bp >= f32(theta)) & (partner_f >= 0),
                (q << partner_bits) | (partner_f + 1), 0)
            best_packed = _run_segment_max(
                packed_edge.reshape(H, W), comp2d, comp_cur_c, runs, M)
            hook = best_packed > 0
            partner = (best_packed & ((1 << partner_bits) - 1)) - 1
        else:
            comp_best = jax.ops.segment_max(bp, own_f, num_segments=M)
            elig = bp == comp_best[own_f]
            partner = jax.ops.segment_max(
                jnp.where(elig, partner_f, -1), own_f, num_segments=M)
            hook = (comp_best >= f32(theta)) & (partner >= 0)
        # early-exit while_loop, NOT unrolled: unrolling emits
        # ceil(log2 M) = 16 pointer-jump gathers at M=65536 (~0.47 ms
        # each, xprof); real absorb hook forests resolve in 2-3 jumps.
        # Jumps run on the live dense prefix when it fits (hook targets
        # are dense stage-1 ids < n_comp_total; `_contract_prefix`)
        parent = _contract_prefix(
            jnp.where(hook, jnp.maximum(partner, 0), ids), n_comp_total,
            small=SMALL)

        # fold dying components' stats into their roots — on the live
        # dense prefix when it fits (see SMALL above)
        def _merge_tables(cls_lp_s, size_s, parent_s):
            m = parent_s.shape[0]
            dying = parent_s != jnp.arange(m, dtype=jnp.int32)
            c = cls_lp_s.at[parent_s].add(
                jnp.where(dying[:, None], cls_lp_s, 0.0))
            c = jnp.where(dying[:, None], 0.0, c)
            s = size_s + jax.ops.segment_sum(
                jnp.where(dying, size_s, 0), parent_s, num_segments=m)
            s = jnp.where(dying, 0, s)
            return c, s

        if SMALL < M:
            def _mt_fast(a):
                c, s = _merge_tables(a[0][:SMALL], a[1][:SMALL],
                                     a[2][:SMALL])
                return a[0].at[:SMALL].set(c), a[1].at[:SMALL].set(s)
            cls_lp, size = jax.lax.cond(
                n_comp_total <= SMALL, _mt_fast,
                lambda a: _merge_tables(a[0], a[1], a[2]),
                (cls_lp, size, parent))
        else:
            cls_lp, size = _merge_tables(cls_lp, size, parent)
        tparent = parent if tparent is None else parent[tparent]

    # ---- stage 3: re-densify to M2 + pair dedup ----
    live = size > 0
    dense2 = (jnp.cumsum(live.astype(jnp.int32)) - 1).astype(jnp.int32)
    over2 = live & (dense2 >= M2)
    map2 = jnp.where(live, jnp.minimum(dense2, M2 - 1), 0)

    # the M -> M2 re-densify segment ops run on the live dense PREFIX
    # when the stage-1 component count fits (the `_contract_prefix`
    # closure argument: every live slot and map2 target sits below
    # n_comp_total; prefix slices leave the scatter inputs 8x smaller)
    def _redensify(cls_lp_s, size_s, frz_s, map2_s, over2_s, live_s):
        sel_s = live_s.astype(jnp.int32)
        c = jax.ops.segment_sum(cls_lp_s * sel_s[:, None], map2_s,
                                num_segments=M2)
        s = jax.ops.segment_sum(size_s * sel_s, map2_s, num_segments=M2)
        f = jax.ops.segment_max(
            ((frz_s | over2_s) & live_s).astype(jnp.int32), map2_s,
            num_segments=M2) > 0
        return c, s, f

    if SMALL < M:
        cls_lp, size, frozen = jax.lax.cond(
            n_comp_total <= SMALL,
            lambda a: _redensify(*(x[:SMALL] for x in a)),
            lambda a: _redensify(*a),
            (cls_lp, size, frozen, map2, over2, live))
    else:
        cls_lp, size, frozen = _redensify(cls_lp, size, frozen, map2,
                                          over2, live)
    # one fused run-granular apply: dedup id + frozen flag per pixel
    # (see stage-2 comment).  M2 <= 46339 < 2^16, the flag rides bit 16.
    # The table is composed at RUN granularity (G-sized gathers) on the
    # fast path; the M-sized composition (~0.6 ms per M-gather, xprof)
    # only executes on the run-budget-overflow fallback.
    tcur_c = comp_c if tparent is None else tparent[comp_c]
    t_c = map2[tcur_c]
    t_c = t_c | jnp.where(frozen[t_c], 1 << 16, 0)

    def _t_full():
        t = map2 if tparent is None else map2[tparent]
        return t | jnp.where(frozen[t], 1 << 16, 0)

    tp = _run_apply(None, comp_c, comp2d_s1, runs, vals_c=t_c,
                    table_fn=_t_full)
    comp2d = tp & ((1 << 16) - 1)
    froz2d = tp >= (1 << 16)

    total_map, cls_lp, size, stats = _pair_phase(
        comp2d, cls_lp, size, frozen, log_odds, offsets, M2, pair_slots,
        pair_rounds, den_mode, omf, bias, packed=True,
        edge_slots=edge_slots,
        dedup_block=None if edge_slots is not None else dedup_block,
        dedup_slots=dedup_slots, froz2d=froz2d)

    parent, root_class, is_inst = _finalize_tables(
        cls_lp, size, frozen, M2, do_prune, prune_threshold)
    tm = total_map if parent is None else parent[total_map]
    # compose the final M2 tables back to per-RUN values (G-sized
    # gathers) so the per-pixel apply is one run-granular fill; the
    # M-sized composition only executes on the fallback path
    t16_c = t_c & ((1 << 16) - 1)
    if relabel:
        # compose the instance-id table into tm so the final mask costs
        # ONE per-pixel apply (the separate relabel_mask call costs a
        # second one); identical output to
        # relabel_mask(tm[comp2d], root_class, is_inst)
        inst_id = jnp.cumsum(is_inst.astype(jnp.int32))
        idtab = jnp.where(is_inst, inst_id, 0)
        mask = _run_apply(
            None, comp_c, comp2d_s1, runs, vals_c=idtab[tm[t16_c]],
            table_fn=lambda: idtab[tm][_t_full() & ((1 << 16) - 1)])
        k = jnp.where(is_inst, inst_id - 1, M2 - 1)
        inst_class = jnp.full((M2,), -1, jnp.int32).at[k].max(
            jnp.where(is_inst, root_class,
                      jnp.full_like(root_class, -1)))
        out = (mask, inst_class)
    else:
        comp = _run_apply(
            None, comp_c, comp2d_s1, runs, vals_c=tm[t16_c],
            table_fn=lambda: tm[_t_full() & ((1 << 16) - 1)])
        out = (comp, root_class, is_inst)
    if return_stats:
        stats = dict(stats, n_frozen=jnp.sum(frozen.astype(jnp.int32)))
        return out + (stats,)
    return out



@functools.partial(jax.jit, static_argnames=("offsets",))
def _count_unique_pairs(label2d, offsets):
    """Number of distinct component pairs linked by any (pixel, offset)
    edge, for labels given as root PIXEL ids — sizes the exact finisher's
    `pair_slots` so nothing can overflow."""
    H, W = label2d.shape
    los, his = [], []
    for (di, dj) in offsets:
        other = _shift2d(label2d, di, dj, -1)
        ext = (other >= 0) & (other != label2d)
        lo = jnp.minimum(label2d, other)
        hi = jnp.maximum(label2d, other)
        los.append(jnp.where(ext, lo, jnp.int32(2 ** 30)).reshape(-1))
        his.append(jnp.where(ext, hi, jnp.int32(2 ** 30)).reshape(-1))
    lo_s, hi_s = jax.lax.sort(
        (jnp.concatenate(los), jnp.concatenate(his)), num_keys=2)
    first = jnp.concatenate([
        jnp.ones((1,), bool),
        (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])])
    return jnp.sum((first & (lo_s < 2 ** 30)).astype(jnp.int32))


@functools.partial(
    jax.jit,
    static_argnames=("num_classes", "offsets", "den_mode",
                     "same_different_bias", "object_merge_factor",
                     "merge_logprob_bias", "max_components", "pair_slots",
                     "pair_rounds", "edge_slots", "do_prune",
                     "prune_threshold", "anneal_start", "anneal_halvings"))
def _pair_exact_finish(class_probs, sameness_probs, num_classes, offsets,
                       initial_labels, same_different_bias=0.0,
                       object_merge_factor=1.0, merge_logprob_bias=0.0,
                       den_mode="sum", max_components=65536,
                       pair_slots=262144, pair_rounds=64, edge_slots=None,
                       do_prune=False, prune_threshold=200.0,
                       anneal_start=0.0, anneal_halvings=0):
    """Exact finisher for `run_segmentation_device`: pure aggregated
    Boruvka pair rounds from `initial_labels` (self-rooted root pixel
    ids, e.g. a `boruvka_rolls_round` result).

    The caller guarantees `max_components` >= live components and
    `pair_slots` > unique pairs (`_count_unique_pairs`), so nothing
    freezes or drops — exact aggregated semantics, at pair-array sizes
    instead of `decode_on_device`'s full-edge-count rounds (~20x faster).
    Uses `_pair_phase` in 2-key mode when the component space exceeds the
    int32 packing range."""
    H, W, C = class_probs.shape
    N = H * W
    M2 = min(max_components, N)
    f32 = jnp.float32
    omf = f32(object_merge_factor)
    bias = f32(merge_logprob_bias)
    cls_lp_pix, log_odds = _log_domain(class_probs, sameness_probs,
                                       same_different_bias)
    # the caller guarantees capacity; if it is ever violated,
    # _densify_stats freezes the clamp slot (where all overflow
    # collapses) instead of emitting a garbage merged instance
    comp2d, cls_lp, size, frozen, _ = _densify_stats(
        initial_labels, cls_lp_pix, M2)

    packed = (M2 + 1) * (M2 + 1) - 1 <= 2 ** 31 - 1
    total_map, cls_lp, size, _ = _pair_phase(
        comp2d, cls_lp, size, frozen, log_odds, offsets, M2, pair_slots,
        pair_rounds, den_mode, omf, bias, packed=packed,
        edge_slots=edge_slots, anneal_start=anneal_start,
        anneal_halvings=anneal_halvings)

    comp = total_map[comp2d.reshape(-1)].reshape(H, W)
    return _finalize_components(comp, cls_lp, size, frozen, M2, do_prune,
                                prune_threshold)


def decode_on_device_staged(class_probs, sameness_probs, num_classes,
                            offsets, stage1_rounds=4, stage2_components=8,
                            stage2_edges=2, **kw):
    """Exact decode in three stages inside one traceable computation: the
    rolls-only first Boruvka round collapses the half-million singleton
    components with no sorts (`boruvka_rolls_round`), a few UNCAPPED
    aggregated rounds contract the survivors far below the stage-3
    capacities (one rolls round alone leaves millions of external edges —
    capping straight away would overflow `max_edges` and silently drop
    later offsets' pair evidence), then a capped pass finishes cheaply.
    `run_segmentation_device` is the stronger alternative when host
    orchestration is allowed: it measures the counts and picks
    overflow-proof capacities.

    stage2_components / stage2_edges: capacity divisors for the final
    pass (N // stage2_components, N // stage2_edges)."""
    H, W = class_probs.shape[:2]
    N = H * W
    kw.pop("initial_labels", None)
    kw.pop("max_components", None)
    kw.pop("max_edges", None)
    kw1 = {k: kw[k] for k in ("same_different_bias", "object_merge_factor",
                              "merge_logprob_bias", "den_mode") if k in kw}
    lab1, _, _ = boruvka_rolls_round(
        class_probs, sameness_probs, num_classes, offsets, **kw1)
    lab2, _, _ = decode_on_device(
        class_probs, sameness_probs, num_classes, offsets,
        initial_labels=lab1, max_rounds=stage1_rounds, **kw1)
    # decode_on_device returns dense component ids; re-anchor them to
    # self-rooted pixel ids for the initial_labels contract
    flat2 = lab2.reshape(-1)
    rep_pixel = jax.ops.segment_min(
        jnp.arange(N, dtype=jnp.int32), flat2, num_segments=N)
    lab2 = rep_pixel[flat2].reshape(H, W)
    return decode_on_device(
        class_probs, sameness_probs, num_classes, offsets,
        initial_labels=lab2,
        max_components=max(4096, N // stage2_components),
        max_edges=max(16384, N // stage2_edges), **kw)


def decode_on_device_batch(class_probs, sameness_probs, num_classes,
                           offsets, **kw):
    """Batched decode: (B, H, W, C)/(B, H, W, O) -> (masks, inst_classes).

    Uses `lax.map` (a sequential scan over the batch in ONE device
    dispatch), NOT vmap: a vmapped `lax.while_loop` couples convergence
    across the batch — every image pays the slowest image's round count
    times the whole batch's per-round cost — and measured slower per frame
    than unbatched decode.  lax.map runs each image's loop independently,
    so per-frame compute matches B=1 while the per-dispatch host/relay
    overhead (~29 ms on this backend) is paid once per batch."""

    def one(args):
        c, s = args
        if kw.get("max_components") is None and kw.get("max_edges") is None:
            label, root_class, is_inst = decode_on_device_staged(
                c, s, num_classes, tuple(offsets),
                **{k: v for k, v in kw.items()
                   if k not in ("max_components", "max_edges")})
        else:
            label, root_class, is_inst = decode_on_device(
                c, s, num_classes, tuple(offsets), **kw)
        return relabel_mask(label, root_class, is_inst)

    return jax.lax.map(one, (class_probs, sameness_probs))


def _bucket(n, floor):
    """Next power of two >= max(n, floor) — static jit capacities from
    measured counts (bucketing bounds the number of compilations)."""
    n = max(int(n), floor, 1)
    return 1 << int(np.ceil(np.log2(n)))


def run_segmentation_device(class_probs, sameness_probs, num_classes,
                            offsets, same_different_bias=0.0,
                            object_merge_factor=1.0, merge_logprob_bias=0.0,
                            den_mode="sum", do_prune=False,
                            prune_threshold=200.0, max_rounds=48,
                            max_components=None, max_edges=None,
                            mode="exact", return_stats=False,
                            anneal_start=8.0, anneal_halvings=8):
    """Host-friendly wrapper with the csegment.run_segmentation signature:
    accepts channel-first (C, H, W)/(O, H, W) numpy arrays and returns
    (mask, object_class list).

    mode='exact' (default, no capacity caps) = progressive recompaction:
    the rolls-only round collapses singletons, then ANNEALED aggregated
    pair rounds run with capacities bucketed from the MEASURED
    component/edge counts — overflow-proof (no frozen components, unlike
    static caps), and each stage's sorts shrink with the survivor count.

    anneal_start / anneal_halvings (exact mode only): greedy-ORDER
    emulation in the pair rounds — round r only applies merges whose
    component-best priority is >= anneal_start * 0.5^r (0 after
    anneal_halvings rounds), so weakly-positive merges are deferred
    until the components they link have grown and the aggregated pair
    evidence is decisive, like the serial greedy's global best-first
    heap.  WHY this is the default: with tau fixed at 0 every
    weakly-positive hook applies in round 1, committing cross-instance
    seam merges the greedy would re-evaluate and reject — measured
    -3.0 AP vs the C++ greedy over a 50-image 512x1024 val set,
    concentrated in ~10 frames (worst -45 AP/frame); with the 8.0/8
    schedule the same sweep measures +1.5 AP AHEAD of the greedy
    (docs/decoder.md "Exact mode", schedule-form ablation in
    tests/fixtures/certification512/exact_anneal_r4.json).  Pass
    anneal_halvings=0 for the plain rounds.  NOTE: the bucketing
    (next power of two, `_bucket`) means a heterogeneous image
    stream can trigger one multi-second XLA compile per NEW
    (component, pair, edge)-bucket triple before the jit cache warms —
    typically 1-3 compiles per (H, W); use mode='hier' (single static
    configuration) for latency-sensitive serving.
    mode='hier' = the certified single-dispatch serving configuration
    (`decode_hierarchical` defaults).  Passing max_components/max_edges
    selects the single-pass capped (throughput) mode instead.

    return_stats=True additionally returns a dict of capacity telemetry
    (ints): in 'hier' mode the decode's own counters (n_ext,
    edges_dropped, pairs_total, pairs_dropped, n_frozen — all zero drops
    on an in-budget scene; a serving layer should fall back to
    mode='exact' when any *_dropped or n_frozen is positive); in 'exact'
    mode the measured counts (all drops structurally zero)."""
    cp = np.moveaxis(np.asarray(class_probs), 0, -1)
    sp = np.moveaxis(np.asarray(sameness_probs), 0, -1)
    cp, sp = jnp.asarray(cp), jnp.asarray(sp)
    offsets = tuple(offsets)
    hyper = dict(same_different_bias=same_different_bias,
                 object_merge_factor=object_merge_factor,
                 merge_logprob_bias=merge_logprob_bias, den_mode=den_mode)
    stats = None
    if mode == "hier":
        if max_components is not None or max_edges is not None:
            raise ValueError(
                "mode='hier' runs decode_hierarchical's static serving "
                "configuration and would ignore max_components/"
                "max_edges; drop the caps, or drop mode='hier' to select "
                "the capped single-pass decode_on_device")
        label, root_class, is_inst, stats = decode_hierarchical(
            cp, sp, num_classes, offsets, do_prune=do_prune,
            prune_threshold=prune_threshold, return_stats=True, **hyper)
    elif max_components is not None or max_edges is not None:
        label, root_class, is_inst = decode_on_device(
            cp, sp, num_classes, offsets,
            max_components=max_components, max_edges=max_edges,
            do_prune=do_prune, prune_threshold=prune_threshold,
            max_rounds=max_rounds, **hyper)
    else:
        # exact mode: rolls round collapses singletons, then pure
        # aggregated Boruvka pair rounds with MEASURED (overflow-proof)
        # capacities — ~20x faster than the old per-stage full-edge-count
        # rounds with identical aggregated semantics
        label, n_comp, n_ext = boruvka_rolls_round(
            cp, sp, num_classes, offsets, **hyper)
        n_pairs = int(_count_unique_pairs(label, offsets))
        comp, root_class, is_inst = _pair_exact_finish(
            cp, sp, num_classes, offsets, initial_labels=label,
            max_components=_bucket(int(n_comp), 4096),
            pair_slots=_bucket(n_pairs + 2, 16384),
            edge_slots=_bucket(int(n_ext) + 1, 16384),
            pair_rounds=max_rounds, do_prune=do_prune,
            prune_threshold=prune_threshold,
            anneal_start=float(anneal_start),
            anneal_halvings=int(anneal_halvings), **hyper)
        label = comp
        stats = {"n_ext": int(n_ext), "edges_dropped": 0,
                 "pairs_total": n_pairs, "pairs_dropped": 0, "n_frozen": 0}
    mask, inst_class = relabel_mask(label, root_class, is_inst)
    mask = np.asarray(mask)
    inst_class = np.asarray(inst_class)
    classes = []
    for v in inst_class:
        if v == -1:
            break
        classes.append(int(v))
    if return_stats:
        if stats is None:
            stats = {}
        stats = {k: int(v) for k, v in stats.items()}
        return mask, classes, stats
    return mask, classes
