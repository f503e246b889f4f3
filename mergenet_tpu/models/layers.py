"""Shared building blocks for the model zoo.

TPU-first conventions:
  * NHWC layout everywhere (XLA's native conv layout on TPU).
  * BatchNorm is cross-replica when `axis_name` is set — under `shard_map`
    or `pmap` the batch statistics are reduced over the data axis with a
    single XLA collective.  This replaces the reference's entire
    `models/modules/` thread-rendezvous SyncBN stack
    (`models/modules/{batchnorm,comm,replicate}.py`, ~540 LoC) with one flag.
  * bilinear resizes via `jax.image.resize` (compiles to gathers/matmuls the
    TPU handles well).
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class SyncBatchNorm(nn.Module):
    """BatchNorm whose batch statistics are synchronized across the mesh
    axis `axis_name` (exact math parity with the reference SyncBN,
    `models/modules/batchnorm.py:113-125`, including the unbiased
    running-variance update that flax implements natively via
    `use_fast_variance=False` semantics; flax's default biased estimator is
    used for normalization just like torch)."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Optional[str] = None  # compute dtype; params/stats stay float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )(x)


class ConvBNRelu(nn.Module):
    """conv -> (sync)BN -> relu, the workhorse block."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    axis_name: Optional[str] = None
    relu: bool = True
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding="SAME", use_bias=self.use_bias,
                    dtype=self.dtype)(x)
        x = SyncBatchNorm(axis_name=self.axis_name,
                          dtype=self.dtype)(x, train)
        if self.relu:
            x = nn.relu(x)
        return x


def resize_bilinear(x, size):
    """Bilinear resize of NHWC (or HWC) tensors to spatial `size` (h, w)."""
    if x.ndim == 4:
        shape = (x.shape[0], size[0], size[1], x.shape[3])
    else:
        shape = (size[0], size[1], x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear")


def max_pool(x, window=2, stride=2, padding="VALID"):
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=padding)


def adaptive_avg_pool(x, out_size):
    """Adaptive average pooling to (out_size, out_size), NHWC.

    Matches torch's AdaptiveAvgPool2d when the input is divisible by
    out_size (the PSP pool sizes 1/2/3/6 on standard crops); for the general
    case it averages over the torch-style floor/ceil index windows.
    """
    n, h, w, c = x.shape
    if h % out_size == 0 and w % out_size == 0:
        kh, kw = h // out_size, w // out_size
        return nn.avg_pool(x, (kh, kw), strides=(kh, kw), padding="VALID")
    # general case: integral-image based exact windows
    import numpy as np
    hs = np.floor(np.arange(out_size) * h / out_size).astype(int)
    he = np.ceil((np.arange(out_size) + 1) * h / out_size).astype(int)
    ws = np.floor(np.arange(out_size) * w / out_size).astype(int)
    we = np.ceil((np.arange(out_size) + 1) * w / out_size).astype(int)
    rows = []
    for i in range(out_size):
        cols = []
        for j in range(out_size):
            cols.append(jnp.mean(
                x[:, hs[i]:he[i], ws[j]:we[j], :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)
