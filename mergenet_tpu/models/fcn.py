"""FCN segmentation heads over ResNet and VGG16 backbones.

Capability parity with reference `models/fcn.py:10-138`: score heads at
strides 32/16/8 fused by bilinear upsample-and-add, final bilinear upsample
to input resolution.  NHWC: (N, H, W, 3) -> (N, H, W, C+O) logits.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import resize_bilinear
from .resnet import ResNetBackbone
from .vgg import VGG16Backbone


class FCNResNet(nn.Module):
    num_outputs: int  # num_classes + num_offsets
    scale: int = 8    # 8, 16 or 32
    layer: int = 18
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True, output_size=None):
        if self.scale not in (8, 16, 32):
            raise ValueError("scale must be 8, 16 or 32")
        input_size = x.shape[1:3]
        c2, c3, c4, c5 = ResNetBackbone(
            layer=self.layer, axis_name=self.axis_name,
            dtype=self.dtype)(x, train)
        score = nn.Conv(self.num_outputs, (1, 1), name="score_32s", dtype=self.dtype)(c5)
        if self.scale <= 16:
            score_16s = nn.Conv(self.num_outputs, (1, 1),
                                name="score_16s", dtype=self.dtype)(c4)
            score = score_16s + resize_bilinear(score, c4.shape[1:3])
        if self.scale <= 8:
            score_8s = nn.Conv(self.num_outputs, (1, 1), name="score_8s", dtype=self.dtype)(c3)
            score = score_8s + resize_bilinear(score, c3.shape[1:3])
        out_size = tuple(output_size) if output_size else input_size
        return resize_bilinear(score, out_size).astype(jnp.float32)


class FCNVGG16(nn.Module):
    """`ref_head=True` reproduces the reference head geometry exactly —
    a VALID-padded 7x7 fc-conv (`models/fcn.py:97` has no padding, so the
    /32 score map shrinks by 6 before upsampling) — which makes imported
    reference checkpoints forward-parity exact
    (`weight_import.fcn_vgg16_mapping`).  The default SAME padding keeps
    the /32 spatial dims (works at any input size; preferred when
    training from scratch)."""

    num_outputs: int
    scale: int = 8
    ref_head: bool = False
    width_mult: float = 1.0
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True, output_size=None):
        if self.scale not in (8, 16, 32):
            raise ValueError("scale must be 8, 16 or 32")
        input_size = x.shape[1:3]
        b1, b2, b3, b4, b5 = VGG16Backbone(
            width_mult=self.width_mult, dtype=self.dtype)(x, train)
        # fc-style head on the /32 features (reference fcn.py:98-104)
        from .vgg import vgg_width
        y = nn.relu(nn.Conv(vgg_width(4096, self.width_mult), (7, 7),
                            padding="VALID" if self.ref_head else "SAME",
                            dtype=self.dtype)(b5))
        y = nn.Dropout(0.5, deterministic=not train)(y)
        y = nn.relu(nn.Conv(vgg_width(4096, self.width_mult), (1, 1),
                            dtype=self.dtype)(y))
        y = nn.Dropout(0.5, deterministic=not train)(y)
        score = nn.Conv(self.num_outputs, (1, 1), name="score_32s", dtype=self.dtype)(y)
        if self.scale <= 16:
            score_16s = nn.Conv(self.num_outputs, (1, 1),
                                name="score_16s", dtype=self.dtype)(b4)
            score = score_16s + resize_bilinear(score, b4.shape[1:3])
        if self.scale <= 8:
            score_8s = nn.Conv(self.num_outputs, (1, 1), name="score_8s", dtype=self.dtype)(b3)
            score = score_8s + resize_bilinear(score, b3.shape[1:3])
        out_size = tuple(output_size) if output_size else input_size
        return resize_bilinear(score, out_size).astype(jnp.float32)
