"""Pallas kernel for the decoder's absorption-round edge scan.

One absorption round of `decode_hierarchical` evaluates, for every pixel,
the best eligible same-class absorption edge over all offsets in both
directions (2*O candidate planes).  The XLA lowering materializes ~4
shifted copies of the component/stat/log-odds grids per offset in HBM;
this kernel keeps the (row-padded) grids resident in VMEM and runs the
whole scan in one pass: the grid iterates (row_block, offset) with the
offset dimension innermost, accumulating the running (best_pri,
best_partner) in the revisited output block (TPU grid steps are
sequential, so in-place accumulation is safe).  Row shifts become
dynamic slices into the padded arrays; column shifts are VMEM rolls with
border masks.

Semantics are bit-identical to the jnp path in
`decoder/device.py::decode_hierarchical` stage 2 (same eligibility, same
up-size hooking direction, same (pri, partner) tie-break); equivalence is
asserted by tests/test_pallas_absorb.py.  Used automatically on TPU
backends when the padded grids fit VMEM; the jnp path remains the
reference and the fallback.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.0e38

# resident set: 3 padded planes + 2 output blocks + temporaries; keep the
# whole-image residency well under the ~16 MB/core VMEM budget
_MAX_PIXELS = 600_000
_ROW_BLOCKS = 4


def _col_shift(x, dj, fill, col_ok):
    if dj:
        x = pltpu.roll(x, shift=(-dj) % x.shape[1], axis=1)
    return jnp.where(col_ok, x, fill)


def _unpack(packed):
    return packed >> 5, (packed >> 1) & 15, (packed & 1) == 1


def _make_kernel(offsets, theta, size_cap, H, W, HB, HR):
    theta = float(theta)

    def kernel(comp_ref, packed_ref, lo_ref, pri_ref, partner_ref):
        hb = pl.program_id(0)
        oi = pl.program_id(1)
        r0 = hb * HB

        @pl.when(oi == 0)
        def _():
            pri_ref[:] = jnp.full((HB, W), NEG_INF, jnp.float32)
            partner_ref[:] = jnp.full((HB, W), -1, jnp.int32)

        rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (HB, W), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (HB, W), 1)
        # HR is 8-aligned, r0 is a multiple of HB: aligned loads
        c_start = pl.multiple_of(HR + r0, 8)
        comp = comp_ref[pl.ds(c_start, HB), :]
        packed = packed_ref[pl.ds(c_start, HB), :]
        oml = lo_ref[0, pl.ds(c_start, HB), :]
        size_own, arg_own, froz_own = _unpack(packed)

        def consider(p, q):
            bp = pri_ref[:]
            bq = partner_ref[:]
            take = (p > bp) | ((p == bp) & (q > bq))
            pri_ref[:] = jnp.where(take, p, bp)
            partner_ref[:] = jnp.where(take, q, bq)

        def shifted(ref, di, dj, fill, ok, plane=None):
            """ref rows r0+di..+HB (padded, always in range), cols +dj.

            Mosaic requires row starts provably 8-aligned; r0 is a
            multiple of HB (>= 128), so the residue (HR + di) % 8 is
            STATIC — load an aligned slab and rotate it down by the
            residue (static roll), then take the leading HB rows."""
            base = HR + di
            delta = base % 8
            start = pl.multiple_of(r0 + (base - delta), 8)
            n = HB + 8
            if plane is None:
                slab = ref[pl.ds(start, n), :]
            else:
                slab = ref[plane, pl.ds(start, n), :]
            if delta:
                slab = pltpu.roll(slab, shift=n - delta, axis=0)
            return _col_shift(slab[:HB], dj, fill, ok)

        def branch(di, dj):
            def f():
                ok_f = ((rows + di >= 0) & (rows + di < H) &
                        (cols + dj >= 0) & (cols + dj < W))
                comp_n = shifted(comp_ref, di, dj, -1, ok_f)
                packed_n = shifted(packed_ref, di, dj, 0, ok_f)
                size_n, arg_n, froz_n = _unpack(packed_n)
                ok = ((comp_n >= 0) & (comp_n != comp) &
                      (arg_n == arg_own) &
                      (jnp.minimum(size_own, size_n) <= size_cap) &
                      (oml >= theta) & ~froz_own & ~froz_n)
                up = (size_n > size_own) | ((size_n == size_own) &
                                            (comp_n > comp))
                consider(jnp.where(ok & up, oml, NEG_INF), comp_n)
                # backward: hook into comp(p - o) via that pixel's edge
                ok_b = ((rows - di >= 0) & (rows - di < H) &
                        (cols - dj >= 0) & (cols - dj < W))
                comp_p = shifted(comp_ref, -di, -dj, -1, ok_b)
                packed_p = shifted(packed_ref, -di, -dj, 0, ok_b)
                oml_p = shifted(lo_ref, -di, -dj, 0.0, ok_b, plane=0)
                size_p, arg_p, froz_p = _unpack(packed_p)
                okb = ((comp_p >= 0) & (comp_p != comp) &
                       (arg_p == arg_own) &
                       (jnp.minimum(size_own, size_p) <= size_cap) &
                       (oml_p >= theta) & ~froz_own & ~froz_p)
                upb = (size_p > size_own) | ((size_p == size_own) &
                                             (comp_p > comp))
                consider(jnp.where(okb & upb, oml_p, NEG_INF), comp_p)
            return f

        jax.lax.switch(oi, [branch(di, dj) for (di, dj) in offsets])

    return kernel


@functools.partial(jax.jit, static_argnames=("offsets", "theta",
                                             "size_cap"))
def absorb_best_edges(comp2d, packed_own, log_odds_t, offsets, theta,
                      size_cap):
    """Fused best-absorption-edge scan.

    comp2d: (H, W) int32 dense component ids.
    packed_own: (H, W) int32 per-pixel packed (size<<5 | argcls<<1 | froz).
    log_odds_t: (O, H, W) float32 sameness log-odds, offset-major.
    Returns (best_pri (H, W) f32, best_partner (H, W) i32).
    """
    H, W = comp2d.shape
    O = len(offsets)
    HB = -(-H // _ROW_BLOCKS)
    # pad rows by the max |row shift| (rounded up for sublane alignment);
    # +8 bottom slack for the aligned-slab loads
    HR = max(8, -(-max(abs(di) for di, _ in offsets) // 8) * 8)
    pad = ((HR, HR + 8 + HB * _ROW_BLOCKS - H), (0, 0))
    comp_pad = jnp.pad(comp2d, pad, constant_values=-1)
    packed_pad = jnp.pad(packed_own, pad, constant_values=0)
    lo_pad = jnp.pad(log_odds_t, ((0, 0),) + pad, constant_values=0.0)
    kernel = _make_kernel(offsets, theta, size_cap, H, W, HB, HR)
    pri, partner = pl.pallas_call(
        kernel,
        grid=(_ROW_BLOCKS, O),
        in_specs=[
            pl.BlockSpec(comp_pad.shape, lambda hb, oi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(packed_pad.shape, lambda hb, oi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + comp_pad.shape,
                         lambda hb, oi: (oi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((HB, W), lambda hb, oi: (hb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HB, W), lambda hb, oi: (hb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((HB * _ROW_BLOCKS, W), jnp.float32),
            jax.ShapeDtypeStruct((HB * _ROW_BLOCKS, W), jnp.int32),
        ],
    )(comp_pad, packed_pad, lo_pad)
    return pri[:H], partner[:H]


def absorb_scan_supported(H, W):
    """True when the fused kernel's VMEM residency fits."""
    return (jax.default_backend() == "tpu" and H * W <= _MAX_PIXELS
            and W % 128 == 0 and H % (8 * _ROW_BLOCKS) == 0)
