"""Pallas VMEM table-gather: out[n] = table[idx[n]] for small tables.

XLA lowers an N-indexed 1-D table lookup to a per-element scalar loop on
TPU (~3.7 ms at N=512k, 1.6 GiB/s — profiled in docs/benchmarks.md);
the decoder's relabel/stat lookups gather from component tables that
are tiny (M <= 65536, <= 256 KiB) and fit VMEM whole.  This kernel
keeps the table resident in VMEM as (M//128, 128) rows and resolves
each lookup with a within-VREG lane gather: idx factors as
hi*128 + lo, a `take_along_axis` over the 128-lane chunk row gathers
`lo`, and a compare on `hi` selects which chunk's value survives.  Cost
is linear in M (one lane-gather + select per chunk row per index
block), so it wins for M well below N and loses for table sizes
approaching N — `table_gather_supported` draws the line.

Values pass through untouched as int32 (no matmul / float round-trip),
so packed bit-field tables (decoder stage-2 stats) gather exactly.

Semantics are identical to `table[idx]` on the FULL int32 domain: the
kernel wraps negative indices once (Python-style, i + M) and clamps
into [0, M) before the lane gather — exactly what jnp's indexing
lowers to (negative wrap + XLA gather clamp; verified on TPU).
Decoder component ids are always in-range; the normalization costs one
vector select + min/max per block and removes the silent-divergence
hazard of a latent out-of-range caller bug (a kernel without it
returns 0 for any index whose chunk row does not exist).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# index rows (of 128 lanes) per grid step (512 measured best at both
# M=8192 and M=65536, scripts/bench_tgather.py)
_ROWS = 512
# beyond this table size the per-chunk loop approaches XLA's scalar
# loop; measured crossover is far above the decoder's M=65536
_MAX_TABLE = 1 << 17


def table_gather_supported(n, m):
    return (m % 128 == 0) and 0 < m <= _MAX_TABLE and n >= 128


def _kernel(tab_ref, idx_ref, out_ref, *, chunks):
    # match jnp's table[idx] on the full int32 domain: negative indices
    # wrap once (Python-style, i + M), then everything clamps into [0, M)
    # (XLA gather's out-of-bounds clamp)
    m = chunks * 128
    idx = idx_ref[...]                      # (R, 128) int32
    idx = jnp.clip(jnp.where(idx < 0, idx + m, idx), 0, m - 1)
    lo = idx & 127
    hi = idx >> 7

    def body(h, out):
        chunk = tab_ref[h, :]               # (128,) VMEM row
        row = jnp.broadcast_to(chunk[None, :], lo.shape)
        g = jnp.take_along_axis(row, lo, axis=1)
        return jnp.where(hi == h, g, out)

    out_ref[...] = jax.lax.fori_loop(0, chunks, body,
                                     jnp.zeros_like(idx))


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def table_gather(table, idx, rows=_ROWS, interpret=False):
    """out[n] = table[idx[n]].  table (M,) int32, M % 128 == 0 and
    M <= 2**17; idx any shape, any int32 values (negative wraps once
    then clamps into [0, M) — same as jnp's table[idx]).  Returns
    idx.shape."""
    m = table.shape[0]
    assert m % 128 == 0 and m <= _MAX_TABLE, m
    shape = idx.shape
    flat = idx.reshape(-1)
    n = flat.shape[0]
    nrows = pl.cdiv(n, 128)
    pad = nrows * 128 - n
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    idx2 = flat.reshape(nrows, 128)
    grid = pl.cdiv(nrows, rows)
    out = pl.pallas_call(
        functools.partial(_kernel, chunks=m // 128),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((m // 128, 128), lambda i: (0, 0)),
            pl.BlockSpec((rows, 128), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nrows, 128), jnp.int32),
        interpret=interpret,
    )(table.reshape(m // 128, 128), idx2.astype(jnp.int32))
    return out.reshape(-1)[:n].reshape(shape)
