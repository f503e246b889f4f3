"""Shared building blocks for the model zoo.

TPU-first conventions:
  * NHWC layout everywhere (XLA's native conv layout on TPU).
  * BatchNorm is cross-replica when `axis_name` is set — under `shard_map`
    or `pmap` the batch statistics are reduced over the data axis with a
    single XLA collective.  This replaces the reference's entire
    `models/modules/` thread-rendezvous SyncBN stack
    (`models/modules/{batchnorm,comm,replicate}.py`, ~540 LoC) with one flag.
  * bilinear upsampling as separable weight-matrix contractions (MXU
    work; `jax.image.resize`'s gather lowering measured ~14x slower for
    the serving-path logits resize), same half-pixel triangle weights.
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


def space_to_depth(x, r=2):
    """NHWC space-to-depth: (N, H, W, C) -> (N, H/r, W/r, r*r*C) with
    channel order (row-parity, col-parity, channel)."""
    n, h, w, c = x.shape
    return (x.reshape(n, h // r, r, w // r, r, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, h // r, w // r, r * r * c))


def _s2d_stem_kernel(kernel):
    """Embed a (7, 7, I, F) stride-2 kernel into the (4, 4, 4I, F)
    stride-1 kernel that computes the SAME conv on space-to-depth-2
    input with padding (2, 1): prepend a zero row/col (the 4x4 window
    position outside the 7x7 footprint), then split each spatial axis
    into (tap, parity) so channels line up with `space_to_depth`'s
    (row-parity, col-parity, channel) order."""
    I, F = kernel.shape[2], kernel.shape[3]
    k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    return (k8.reshape(4, 2, 4, 2, I, F)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * I, F))


class StemConv7(nn.Module):
    """The classic ResNet 7x7/stride-2 stem conv, with an optional exact
    space-to-depth rewrite (`s2d=True`): a 4x4/stride-1 conv over the
    2x2-space-to-depth input.  The strided 7x7 on 3 channels keeps the
    MXU contraction tiny and the windows overlapping; the rewrite is the
    standard TPU ResNet stem transform (MLPerf-style) and is bit-exact
    up to summation order (tests/test_models.py).  Owns the SAME param
    tree as the `nn.Conv` it replaces (name it "Conv_0"): kernel stays
    (7, 7, in, features) so checkpoints/imports are unchanged."""

    features: int = 64
    s2d: bool = False
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, x.shape[-1], self.features))
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        if self.s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            return jax.lax.conv_general_dilated(
                space_to_depth(x), _s2d_stem_kernel(kernel), (1, 1),
                ((2, 1), (2, 1)), dimension_numbers=dn)
        return jax.lax.conv_general_dilated(
            x, kernel, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn)


class ConcatFusionConv(nn.Module):
    """3x3/SAME conv over the channel-concat of same-shape feature maps,
    computed as per-part partial convs summed.

    Identical math and an IDENTICAL param tree to
    `nn.Conv(features, (3, 3), padding="SAME")` over the concatenated
    input — kernel (3, 3, sum(part channels), features) plus bias — so
    checkpoints and the weight importer are unchanged (name it like the
    conv it replaces, e.g. "Conv_0").  Splitting keeps the wide concat
    tensor out of HBM: XLA fuses each level's upsample into its partial
    conv instead of materializing the concat first (measured ~15% faster
    at the PSPFPNet fusion shape 256x512x1024 -> 256, docs/benchmarks.md
    "net forward"); the win grows with fpn_dim (UperNet fuses 2048
    channels)."""

    features: int
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, parts):
        total = sum(int(p.shape[-1]) for p in parts)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, total, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        out = None
        c0 = 0
        for p in parts:
            ci = int(p.shape[-1])
            x, k = nn.dtypes.promote_dtype(p, kernel[:, :, c0:c0 + ci, :],
                                           dtype=self.dtype)
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = y if out is None else out + y
            c0 += ci
        return out + bias.astype(out.dtype)


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


def _linear_resize_matrix(n_in, n_out):
    """(n_out, n_in) interpolation matrix with jax.image.resize's
    'bilinear' half-pixel triangle weights for scale >= 1 (no
    antialiasing).  Out-of-range neighbor weights clamp-accumulate onto
    the edge sample, which equals resize's normalize-over-valid-samples
    boundary rule."""
    import numpy as np
    src = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = (src - i0).astype(np.float32)
    lo = np.clip(i0, 0, n_in - 1)
    hi = np.clip(i0 + 1, 0, n_in - 1)
    mat = np.zeros((n_out, n_in), np.float32)
    np.add.at(mat, (np.arange(n_out), lo), 1.0 - frac)
    np.add.at(mat, (np.arange(n_out), hi), frac)
    return mat


def resize_bilinear(x, size):
    """Bilinear resize of NHWC (or HWC) tensors to spatial `size` (h, w).

    Upsampling runs as two separable weight-matrix contractions (MXU
    work; measured 4.3 ms -> ~0.3 ms for the 256x512x19 -> 512x1024
    serving-path resize vs the gather-based jax.image.resize lowering).
    Downsampling falls back to jax.image.resize, whose antialiasing
    filter the matrices don't reproduce."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    H, W = int(size[0]), int(size[1])
    if H < h or W < w:
        out = jax.image.resize(x, (n, H, W, c), method="bilinear")
        return out[0] if squeeze else out
    if (H, W) != (h, w):
        dt = x.dtype
        # bf16 inputs contract in bf16 (native MXU issue rate, half the
        # HBM bytes) with f32 accumulation — same error class as the
        # bf16 gather lowering this replaced; everything else runs the
        # exact f32 path (pinned against jax.image.resize in tests).
        mm_dt = jnp.bfloat16 if dt == jnp.bfloat16 else jnp.float32
        xf = x.astype(mm_dt)
        if H != h:
            ah = jnp.asarray(_linear_resize_matrix(h, H)).astype(mm_dt)
            # (H, h) x (n, h, w, c) -> (n, H, w, c)
            xf = jax.lax.dot_general(
                ah, xf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
            ).transpose(1, 0, 2, 3).astype(mm_dt)
        if W != w:
            aw = jnp.asarray(_linear_resize_matrix(w, W)).astype(mm_dt)
            # (W, w) x (n, H, w, c) -> (n, H, W, c)
            xf = jax.lax.dot_general(
                aw, xf, (((1,), (2,)), ((), ())),
                preferred_element_type=jnp.float32
            ).transpose(1, 2, 0, 3).astype(mm_dt)
        x = xf.astype(dt)
    out = x
    return out[0] if squeeze else out


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
