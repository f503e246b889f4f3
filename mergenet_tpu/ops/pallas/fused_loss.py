"""Pallas TPU kernel: fused class + offset BCE-with-logits loss.

Computes, in ONE pass over the (N, H, W, C+O) logits/targets (the hot
training objective, reference `train_utils.py:54-75`):

    loss = mean(bce(logits[..., :C], targets[..., :C]))
         + alpha * mean(bce(logits[..., C:], targets[..., C:]))

Design notes (what makes this fast on TPU):
  * the tensors are viewed as (pixels, channels) — a free reshape that
    collapses only leading dims, so no lane relayout happens (flattening
    the channel axis would trigger a ~6x relayout copy);
  * the channel split is a per-COLUMN weight computed from a column iota —
    no per-element modulo;
  * each grid step reduces one row-block to a partial sum written to its
    own VMEM slot, keeping the sequential grid free to double-buffer (a
    shared SMEM accumulator would serialize the pipeline);
  * the custom VJP emits d/dlogits = w * (sigmoid(x) - t) in a second
    single-pass kernel.

On non-TPU backends (tests) the kernels run in interpreter mode.

Measured on v5e (8x768x768x19 f32): this kernel 16.4 ms vs XLA's fused
`ops.losses.fused_class_offset_loss` 3.3 ms — XLA wins because the C=19
channel-minor layout lane-pads Pallas block DMAs, while XLA fuses the loss
into the producer with its native layout.  The training step therefore
defaults to the XLA path; this kernel is kept as the validated pattern for
channel counts that fill the 128-lane tile (where it matches XLA) and as
the base for future fused kernels.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8
BLOCK_ROWS = 1024  # pixel rows per grid step


def _interpret():
    return jax.default_backend() != "tpu"


def _bce(x, t):
    return jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _block_weight(block_idx, shape, num_classes, w_cls, w_ofs, n_rows):
    """(BLOCK_ROWS, C) weight plane: w_cls on class columns, w_ofs on
    offset columns, zero on row padding."""
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    w = jnp.where(col < num_classes, jnp.float32(w_cls),
                  jnp.float32(w_ofs))
    global_row = block_idx * shape[0] + row
    return jnp.where(global_row < n_rows, w, 0.0)


def _fwd_kernel(x_ref, t_ref, out_ref, *, num_classes, w_cls, w_ofs,
                n_rows):
    i = pl.program_id(0)
    x = x_ref[...]
    t = t_ref[...]
    w = _block_weight(i, x.shape, num_classes, w_cls, w_ofs, n_rows)
    block_sum = jnp.sum(_bce(x, t) * w)
    r = jax.lax.broadcasted_iota(jnp.int32, (SUBLANE, LANE), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (SUBLANE, LANE), 1)
    out_ref[...] = jnp.where((r == 0) & (c == 0), block_sum, 0.0)


def _bwd_kernel(g_ref, x_ref, t_ref, dx_ref, dt_ref, *, num_classes,
                w_cls, w_ofs, n_rows):
    i = pl.program_id(0)
    x = x_ref[...]
    t = t_ref[...]
    w = _block_weight(i, x.shape, num_classes, w_cls, w_ofs, n_rows) \
        * g_ref[0, 0]
    dx_ref[...] = w * (jax.nn.sigmoid(x) - t)
    dt_ref[...] = w * (-x)


def _as_rows(a):
    """(..., C) -> (P, C): collapses leading dims only (layout-free)."""
    c = a.shape[-1]
    return a.reshape(-1, c)


def _pad_rows(a2):
    p = a2.shape[0]
    padded = ((p + BLOCK_ROWS - 1) // BLOCK_ROWS) * BLOCK_ROWS
    if padded != p:
        a2 = jnp.pad(a2, ((0, padded - p), (0, 0)))
    return a2


def _weights(shape, num_classes, alpha):
    n_channels = shape[-1]
    num_offsets = n_channels - num_classes
    n_pix = 1
    for d in shape[:-1]:
        n_pix *= d
    w_cls = (1.0 / (n_pix * num_classes)) if num_classes else 0.0
    w_ofs = (alpha / (n_pix * num_offsets)) if num_offsets else 0.0
    return w_cls, w_ofs


def _run_forward(logits, targets, num_classes, alpha):
    w_cls, w_ofs = _weights(logits.shape, num_classes, alpha)
    c = logits.shape[-1]
    x2 = _pad_rows(_as_rows(logits.astype(jnp.float32)))
    t2 = _pad_rows(_as_rows(targets.astype(jnp.float32)))
    n_rows = _as_rows(logits).shape[0]
    grid = x2.shape[0] // BLOCK_ROWS

    kern = functools.partial(
        _fwd_kernel, num_classes=num_classes, w_cls=w_cls, w_ofs=w_ofs,
        n_rows=n_rows)
    partials = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUBLANE, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * SUBLANE, LANE), jnp.float32),
        interpret=_interpret(),
    )(x2, t2)
    return jnp.sum(partials)


def _run_backward(logits, targets, num_classes, alpha, g):
    w_cls, w_ofs = _weights(logits.shape, num_classes, alpha)
    c = logits.shape[-1]
    x2 = _pad_rows(_as_rows(logits.astype(jnp.float32)))
    t2 = _pad_rows(_as_rows(targets.astype(jnp.float32)))
    n_rows = _as_rows(logits).shape[0]
    grid = x2.shape[0] // BLOCK_ROWS

    kern = functools.partial(
        _bwd_kernel, num_classes=num_classes, w_cls=w_cls, w_ofs=w_ofs,
        n_rows=n_rows)
    g_arr = jnp.asarray(g, jnp.float32).reshape(1, 1)
    dx2, dt2 = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK_ROWS, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_ROWS, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x2.shape, jnp.float32),
            jax.ShapeDtypeStruct(x2.shape, jnp.float32),
        ),
        interpret=_interpret(),
    )(g_arr, x2, t2)
    dx = dx2[:n_rows].reshape(logits.shape)
    dt = dt2[:n_rows].reshape(targets.shape)
    return dx.astype(logits.dtype), dt.astype(targets.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_class_offset_bce(logits, targets, num_classes, alpha=1.0):
    """Fused loss = mean-BCE(class channels) + alpha * mean-BCE(offset
    channels), computed in one Pallas pass.  logits/targets: channel-last
    (..., C+O)."""
    return _run_forward(logits, targets, num_classes, alpha)


def _vjp_fwd(logits, targets, num_classes, alpha):
    return _run_forward(logits, targets, num_classes, alpha), \
        (logits, targets)


def _vjp_bwd(num_classes, alpha, res, g):
    logits, targets = res
    dx, dt = _run_backward(logits, targets, num_classes, alpha, g)
    return dx, dt


fused_class_offset_bce.defvjp(_vjp_fwd, _vjp_bwd)
