"""Flax ResNet backbones (18/34/50/101/152) returning the 4-stage feature
pyramid, with optional deep 3x3x3 stem and stage dilation.

Covers both reference backbones: torchvision-style ResNet (used by
`models/fcn.py:10-45`, `models/pspnet.py:89-118`) and the deep-stem SyncBN
variant (`models/resnet.py:104-222`, used by UperNet).  Stage dilations
(2, 4) reproduce the dilated ResNet101 of the caffe PSPNet
(`models/pspnet_caffe.py:283-286`).

Strided convs/pools use explicit symmetric padding, not "SAME": flax SAME
pads asymmetrically at even input sizes under stride 2 (e.g. (2, 3) for
the 7x7 stem), while torch pads k//2 on both sides — symmetric padding is
required for numerical parity with imported torch checkpoints
(`utils/weight_import.py`).
"""

from typing import Optional, Sequence, Tuple

from flax import linen as nn

from .layers import StemConv7, SyncBatchNorm, max_pool

STAGE_BLOCKS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}

EXPANSION = {18: 1, 34: 1, 50: 4, 101: 4, 152: 4}


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        pad = ((self.dilation,) * 2,) * 2
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    kernel_dilation=(self.dilation,) * 2, padding=pad,
                    use_bias=False, dtype=self.dtype)(x)
        y = SyncBatchNorm(axis_name=self.axis_name, dtype=self.dtype)(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3),
                    kernel_dilation=(self.dilation,) * 2, padding=pad,
                    use_bias=False, dtype=self.dtype)(y)
        y = SyncBatchNorm(axis_name=self.axis_name, dtype=self.dtype)(y, train)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride,) * 2,
                               use_bias=False, dtype=self.dtype)(x)
            residual = SyncBatchNorm(axis_name=self.axis_name, dtype=self.dtype)(
                residual, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is features * 4
    stride: int = 1
    dilation: int = 1
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = SyncBatchNorm(axis_name=self.axis_name, dtype=self.dtype)(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    kernel_dilation=(self.dilation,) * 2,
                    padding=((self.dilation,) * 2,) * 2,
                    use_bias=False, dtype=self.dtype)(y)
        y = SyncBatchNorm(axis_name=self.axis_name, dtype=self.dtype)(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = SyncBatchNorm(axis_name=self.axis_name, dtype=self.dtype)(y, train)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride,) * 2,
                               use_bias=False, dtype=self.dtype)(x)
            residual = SyncBatchNorm(axis_name=self.axis_name, dtype=self.dtype)(
                residual, train)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """Returns (c2, c3, c4, c5) features at strides 4/8/16/32 (or less when
    stages are dilated)."""

    layer: int = 50
    deep_stem: bool = False
    # per-stage (stride, dilation); PSPNet uses ((1,1),(2,1),(1,2),(1,4))
    stage_strides: Tuple[int, int, int, int] = (1, 2, 2, 2)
    stage_dilations: Tuple[int, int, int, int] = (1, 1, 1, 1)
    # exact space-to-depth rewrite of the 7x7/s2 stem (serving-time TPU
    # optimization; same param tree — see layers.StemConv7)
    s2d_stem: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        blocks = STAGE_BLOCKS[self.layer]
        block_cls = Bottleneck if EXPANSION[self.layer] == 4 else BasicBlock
        bn = lambda: SyncBatchNorm(axis_name=self.axis_name, dtype=self.dtype)

        if self.deep_stem:
            # 3x conv3x3 stem (reference models/resnet.py:109-118)
            x = nn.Conv(64, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype)(x)
            x = nn.relu(bn()(x, train))
            x = nn.Conv(64, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(x)
            x = nn.relu(bn()(x, train))
            x = nn.Conv(128, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(x)
            x = nn.relu(bn()(x, train))
        else:
            x = StemConv7(features=64, s2d=self.s2d_stem,
                          dtype=self.dtype, name="Conv_0")(x)
            x = nn.relu(bn()(x, train))
        x = max_pool(x, window=3, stride=2, padding=((1, 1), (1, 1)))

        features = []
        widths = (64, 128, 256, 512)
        for stage in range(4):
            for i in range(blocks[stage]):
                stride = self.stage_strides[stage] if i == 0 else 1
                x = block_cls(features=widths[stage], stride=stride,
                              dilation=self.stage_dilations[stage],
                              axis_name=self.axis_name,
                              dtype=self.dtype)(x, train)
            features.append(x)
        return tuple(features)


def feature_dims(layer):
    """Channel counts of (c2, c3, c4, c5)."""
    e = EXPANSION[layer]
    return tuple(d * e for d in (64, 128, 256, 512))
