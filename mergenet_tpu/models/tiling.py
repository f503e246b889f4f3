"""Sliding-window ("tile") inference with flip ensembling.

TPU-first re-design of the reference `tile_predict`
(`models/pspnet_caffe.py:492-560`): instead of a Python loop of per-tile
forwards with host round-trips, all tiles (and their horizontal flips) are
gathered into one big batch with static shapes, run through a single jitted
forward, and scatter-added back — one device round-trip per image batch.

The class-remap convention matches the reference (`pspnet_caffe.py:548-554`):
when the model predicts `n_model_classes` semantic classes and the decoder
wants `n_instance_classes`, the background channel of the output is the max
over the first `n_model_classes - n_instance_classes + 1` (non-instance)
channels and the instance channels are copied from the tail.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _tile_grid(full, side):
    """Reference grid arithmetic (`pspnet_caffe.py:506-515`): n = full//side
    + 1 windows of `side` with stride (full - side) / n, ends clamped."""
    n = int(full / float(side)) + 1
    stride = (full - side) / float(n)
    return [int(i * stride) for i in range(n + 1)]


def tile_predict(apply_fn, imgs, n_instance_classes, input_size,
                 n_model_classes=None, include_flip_mode=True):
    """Tiled softmax-ensembled prediction.

    Args:
        apply_fn: jittable fn (N, h, w, 3) -> (N, h, w, C) logits.
        imgs: (N, H, W, 3) array.
        n_instance_classes: channels wanted by the decoder.
        input_size: (side_x, side_y) model window.
        n_model_classes: channels the model outputs (defaults to
            n_instance_classes, i.e. no remap).
        include_flip_mode: also average the horizontally-flipped prediction.
    Returns:
        (N, H, W, n_instance_classes) probability maps, renormalized.
    """
    n, h, w, _ = imgs.shape
    side_x, side_y = input_size
    if n_model_classes is None:
        n_model_classes = n_instance_classes
    xs = _tile_grid(h, side_x)
    ys = _tile_grid(w, side_y)

    # gather all tiles into one batch: (T, N, sx, sy, 3)
    tiles = []
    for sx in xs:
        ex = min(sx + side_x, h)
        sx = ex - side_x
        for sy in ys:
            ey = min(sy + side_y, w)
            sy = ey - side_y
            tiles.append((sx, sy))
    batch = jnp.stack([imgs[:, sx:sx + side_x, sy:sy + side_y, :]
                       for sx, sy in tiles])  # (T, N, sx, sy, 3)
    T = batch.shape[0]
    flat = batch.reshape((T * n, side_x, side_y, imgs.shape[-1]))

    probs = jax.nn.softmax(apply_fn(flat), axis=-1)
    if include_flip_mode:
        flipped = jax.nn.softmax(apply_fn(flat[:, :, ::-1, :]), axis=-1)
        probs = (probs + flipped[:, :, ::-1, :]) / 2.0
    probs = probs.reshape((T, n, side_x, side_y, n_model_classes))

    if n_model_classes != n_instance_classes:
        n_bg = n_model_classes - n_instance_classes + 1
        background = jnp.max(probs[..., :n_bg], axis=-1, keepdims=True)
        probs = jnp.concatenate([background, probs[..., n_bg:]], axis=-1)

    pred = jnp.zeros((n, h, w, n_instance_classes), dtype=probs.dtype)
    count = jnp.zeros((h, w, 1), dtype=probs.dtype)
    for t, (sx, sy) in enumerate(tiles):
        pred = pred.at[:, sx:sx + side_x, sy:sy + side_y, :].add(probs[t])
        count = count.at[sx:sx + side_x, sy:sy + side_y, :].add(1.0)
    score = pred / count[None]
    return score / jnp.sum(score, axis=-1, keepdims=True)
