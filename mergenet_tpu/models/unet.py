"""Flax UNet (encoder-decoder with skip connections).

Capability parity with the reference UNet (`models/Unet.py:118-224`):
depth-5, start_filts 64, 'transpose'/'upsample' up modes and
'concat'/'add' merge modes, BatchNorm after every conv (cross-replica when
axis_name is set), final 1x1 conv to num_classes + num_offsets channels.
NHWC in/out: (N, H, W, 3) -> (N, H, W, C+O) logits.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import SyncBatchNorm, max_pool, resize_bilinear


class DownConv(nn.Module):
    features: int
    pooling: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.relu(SyncBatchNorm(axis_name=self.axis_name, dtype=self.dtype)(x, train))
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.relu(SyncBatchNorm(axis_name=self.axis_name, dtype=self.dtype)(x, train))
        before_pool = x
        if self.pooling:
            x = max_pool(x)
        return x, before_pool


class UpConv(nn.Module):
    features: int
    merge_mode: str = "concat"
    up_mode: str = "transpose"
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, from_down, from_up, train: bool = True):
        if self.up_mode == "transpose":
            x = nn.ConvTranspose(self.features, (2, 2),
                                 strides=(2, 2), dtype=self.dtype)(from_up)
        else:
            x = resize_bilinear(from_up, (from_up.shape[1] * 2,
                                          from_up.shape[2] * 2))
            x = nn.Conv(self.features, (1, 1), dtype=self.dtype)(x)
        if self.merge_mode == "concat":
            x = jnp.concatenate([x, from_down], axis=-1)
        else:
            x = x + from_down
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.relu(SyncBatchNorm(axis_name=self.axis_name, dtype=self.dtype)(x, train))
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.relu(SyncBatchNorm(axis_name=self.axis_name, dtype=self.dtype)(x, train))
        return x


class UNet(nn.Module):
    num_classes: int
    num_offsets: int
    depth: int = 5
    start_filts: int = 64
    up_mode: str = "transpose"
    merge_mode: str = "concat"
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    def setup(self):
        if self.up_mode not in ("transpose", "upsample"):
            raise ValueError("invalid up_mode {}".format(self.up_mode))
        if self.merge_mode not in ("concat", "add"):
            raise ValueError("invalid merge_mode {}".format(self.merge_mode))
        if self.up_mode == "upsample" and self.merge_mode == "add":
            raise ValueError("up_mode 'upsample' is incompatible with "
                             "merge_mode 'add'")

    @nn.compact
    def __call__(self, x, train: bool = True):
        encoder_outs = []
        outs = self.start_filts
        for i in range(self.depth):
            outs = self.start_filts * (2 ** i)
            pooling = i < self.depth - 1
            x, before_pool = DownConv(outs, pooling=pooling,
                                      axis_name=self.axis_name,
                                      dtype=self.dtype)(x, train)
            encoder_outs.append(before_pool)
        for i in range(self.depth - 1):
            outs = outs // 2
            before_pool = encoder_outs[-(i + 2)]
            x = UpConv(outs, merge_mode=self.merge_mode,
                       up_mode=self.up_mode,
                       axis_name=self.axis_name,
                       dtype=self.dtype)(before_pool, x, train)
        x = nn.Conv(self.num_classes + self.num_offsets, (1, 1),
                    dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        return x
