"""Pallas kernel for the flood fill's segmented min-scan sweeps.

`decoder.device._flood_fill` collapses high-confidence interiors with
`ccl` sweeps of stride-sublattice segmented min-scans, horizontal then
vertical (`_scan_sweeps`).  The XLA lowering of each
`lax.associative_scan` round-trips the full label grid through HBM per
doubling step (12 scans x ~10 steps at the default config); this kernel
keeps the label and both link planes resident in VMEM and runs ALL
sweeps in one dispatch as Hillis-Steele doublings over `pltpu.roll`
shifts — pure VPU work.

The label accumulator lives in the output ref and the running gate in an
int32 scratch, with every doubling step an in-place ref update — the
straight-line dataflow version kept ~37 grids live and blew the 16 MB
VMEM budget (measured 75 MB scoped allocation); the ref form bounds the
live set to a few planes plus a step's temporaries.  Everything is
int32: Mosaic's lane rotate does not support int8 vectors.

Semantics are bit-identical to `_scan_sweeps` on a row-major-iota
initial label (the only label `_flood_fill` ever scans): a segmented min
is a deterministic set-min, so the scan formulation (associative_scan
vs. Hillis-Steele) cannot change the result.  Equivalence is asserted by
tests/test_pallas_floodscan.py.  Used automatically on TPU backends when
the grids fit VMEM; `_scan_sweeps` remains the reference and fallback.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INT_MAX = 2147483647
# (H, W) int32 label + link/gate planes + per-step temporaries
_MAX_PIXELS = 524288


def _shift(x, k, axis, fill, H, W):
    """out[p] = x[p - k] along `axis` (k may be negative), out-of-range
    -> fill.  Rolls wrap within the row/column, which the border mask
    then overwrites."""
    n = x.shape[axis]
    out = pltpu.roll(x, shift=k % n, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), axis)
    if k >= 0:
        ok = idx >= k
    else:
        ok = idx < n + k
    return jnp.where(ok, out, fill)


def _make_kernel(H, W, s, t, ccl, has_h, has_v):
    h_steps = int(math.ceil(math.log2(max(W // s, 2)))) if has_h else 0
    v_steps = int(math.ceil(math.log2(max(H // t, 2)))) if has_v else 0

    def kernel(*refs):
        refs = list(refs)
        h_ref = refs.pop(0) if has_h else None
        v_ref = refs.pop(0) if has_v else None
        out_ref = refs.pop(0)
        g_ref = refs.pop(0)     # int32 running-gate scratch
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        out_ref[:] = rows * W + cols       # _flood_fill's initial iota

        def scan_dir(link_ref, stride, steps, axis, forward):
            """One direction of a segmented min-scan, accumulating into
            out_ref.  forward: gate[p] = link(p - stride, p); reverse:
            gate[p] = link(p, p + stride)."""
            if forward:
                g_ref[:] = _shift(link_ref[:], stride, axis,
                                  jnp.int32(0), H, W)
            else:
                g_ref[:] = link_ref[:]
            sgn = 1 if forward else -1
            for i in range(steps):
                d = sgn * (stride << i)
                vs = _shift(out_ref[:], d, axis, _INT_MAX, H, W)
                gs = _shift(g_ref[:], d, axis, jnp.int32(0), H, W)
                g = g_ref[:]
                out_ref[:] = jnp.where(g > 0,
                                       jnp.minimum(out_ref[:], vs),
                                       out_ref[:])
                g_ref[:] = g & gs

        for _ in range(ccl):
            if has_h:
                scan_dir(h_ref, s, h_steps, 1, True)
                scan_dir(h_ref, s, h_steps, 1, False)
            if has_v:
                scan_dir(v_ref, t, v_steps, 0, True)
                scan_dir(v_ref, t, v_steps, 0, False)

    return kernel


@functools.partial(jax.jit, static_argnames=("s", "t", "ccl"))
def _flood_scan_call(h_S, v_S, s, t, ccl):
    args = [a for a in (h_S, v_S) if a is not None]
    H, W = args[0].shape
    kernel = _make_kernel(H, W, s or 1, t or 1, ccl,
                          h_S is not None, v_S is not None)
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(a.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM) for a in args],
        out_specs=pl.BlockSpec((H, W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        scratch_shapes=[pltpu.VMEM((H, W), jnp.int32)],
    )(*args)


def flood_scan(h_S, v_S, s, t, ccl):
    """All `ccl` segmented-min-scan sweeps in one fused kernel.

    h_S / v_S: (H, W) bool strong-link planes (S[p] = edge between p and
    p+stride along the axis) or None; s / t their strides.  Returns the
    scanned (H, W) int32 label grid starting from the row-major iota
    (exactly `_scan_sweeps(iota, ...)`)."""
    h32 = None if h_S is None else h_S.astype(jnp.int32)
    v32 = None if v_S is None else v_S.astype(jnp.int32)
    return _flood_scan_call(h32, v32, s, t, ccl)


def flood_scan_supported(H, W):
    """True when the fused kernel's whole-grid VMEM residency fits."""
    return (jax.default_backend() == "tpu" and H * W <= _MAX_PIXELS
            and W % 128 == 0 and H % 32 == 0)
