"""Pyramid-pooling model family: PSPFPNet, UperNet, and PSPNet.

Capability parity with reference `models/pspnet.py:9-187` (PPM pool sizes
(1,2,3,6); FPN top-down fusion then 4-level concat + final conv; UperNet on
a deep-stem ResNet) and `models/pspnet_caffe.py:238-338` (PSPNet: dilated
ResNet101 with stage dilations (2,4), PPM, dropout classifier head, optional
auxiliary head).  Note the reference's `get_model('pspnet')` references an
undefined `PSPNet` symbol (`models/__init__.py:40`); this implementation
makes the arch actually usable.

NHWC: (N, H, W, 3) -> (N, H, W, C+O) logits.
"""

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import (ConcatFusionConv, SyncBatchNorm, adaptive_avg_pool,
                     resize_bilinear)
from .resnet import ResNetBackbone, feature_dims


class PyramidPoolingModule(nn.Module):
    """Adaptive-pool pyramid: pool to s in pool_sizes, 1x1 conv to
    in_dim/len(pool_sizes), BN+relu, upsample back, concat with input."""

    pool_sizes: Tuple[int, ...] = (1, 2, 3, 6)
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_dim = x.shape[-1]
        out_dim = in_dim // len(self.pool_sizes)
        size = x.shape[1:3]
        out = [x]
        for s in self.pool_sizes:
            y = adaptive_avg_pool(x, s)
            y = nn.Conv(out_dim, (1, 1), use_bias=False,
                        dtype=self.dtype)(y)
            y = nn.relu(SyncBatchNorm(axis_name=self.axis_name,
                                      dtype=self.dtype)(y, train))
            out.append(resize_bilinear(y, size))
        return jnp.concatenate(out, axis=-1)


class FPNModule(nn.Module):
    """Top-down feature-pyramid fusion + multi-level concat head
    (reference `models/pspnet.py:32-86`)."""

    num_outputs: int
    fpn_dim: int = 256
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, down_features, train: bool = True):
        n = len(down_features)
        # lateral 1x1s
        laterals = [nn.Conv(self.fpn_dim, (1, 1), use_bias=False,
                            name="fpn_in_{}".format(i),
                            dtype=self.dtype)(f)
                    for i, f in enumerate(down_features)]
        # top-down accumulation
        last = laterals[-1]
        fpn_features = [nn.Conv(self.fpn_dim, (3, 3), padding="SAME",
                                name="fpn_out_{}".format(n - 1),
                                dtype=self.dtype)(last)]
        for i in reversed(range(n - 1)):
            last = laterals[i] + resize_bilinear(last,
                                                 laterals[i].shape[1:3])
            fpn_features.append(
                nn.Conv(self.fpn_dim, (3, 3), padding="SAME",
                        name="fpn_out_{}".format(i),
                        dtype=self.dtype)(last))
        fpn_features.reverse()  # [P2 .. P5]
        output_size = fpn_features[0].shape[1:3]
        fusion = [fpn_features[0]] + [
            resize_bilinear(f, output_size) for f in fpn_features[1:]]
        # fusion conv as summed per-level partial convs: same math and
        # param tree ("Conv_0") as concat + nn.Conv, but the 4*fpn_dim
        # concat tensor never hits HBM (ConcatFusionConv docstring)
        x = ConcatFusionConv(self.fpn_dim, dtype=self.dtype,
                             name="Conv_0")(fusion)
        x = nn.relu(SyncBatchNorm(axis_name=self.axis_name,
                                      dtype=self.dtype)(x, train))
        x = nn.Conv(self.num_outputs, (1, 1), dtype=self.dtype,
                    name="Conv_1")(x)
        return x


class PSPFPNet(nn.Module):
    """ResNet backbone + PPM on the /32 stage + FPN head
    (reference `models/pspnet.py:89-140`; default arch of the recipes)."""

    num_outputs: int
    layer: int = 50
    fpn_dim: int = 256
    pool_sizes: Tuple[int, ...] = (1, 2, 3, 6)
    # exact space-to-depth stem rewrite (layers.StemConv7); same params
    s2d_stem: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True, output_size=None):
        """output_size: logits resolution; default the input size.  A
        serving path that decodes at a reduced size (reference
        segment.py:93 decodes at half res) should pass it directly and
        skip the full-res logits round trip."""
        out_size = tuple(output_size) if output_size else x.shape[1:3]
        feats = ResNetBackbone(layer=self.layer,
                               s2d_stem=self.s2d_stem,
                               axis_name=self.axis_name,
                               dtype=self.dtype)(x, train)
        c2, c3, c4, c5 = feats
        c5 = PyramidPoolingModule(pool_sizes=self.pool_sizes,
                                  axis_name=self.axis_name,
                                  dtype=self.dtype)(c5, train)
        y = FPNModule(self.num_outputs, fpn_dim=self.fpn_dim,
                      axis_name=self.axis_name, dtype=self.dtype)((c2, c3, c4, c5), train)
        return resize_bilinear(y, out_size).astype(jnp.float32)


class UperNet(nn.Module):
    """Same topology as PSPFPNet but with the deep-stem ResNet and a wider
    FPN (reference `models/pspnet.py:143-187`)."""

    num_outputs: int
    layer: int = 50
    fpn_dim: int = 512
    pool_sizes: Tuple[int, ...] = (1, 2, 3, 6)
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True, output_size=None):
        out_size = tuple(output_size) if output_size else x.shape[1:3]
        feats = ResNetBackbone(layer=self.layer, deep_stem=True,
                               axis_name=self.axis_name,
                               dtype=self.dtype)(x, train)
        c2, c3, c4, c5 = feats
        c5 = PyramidPoolingModule(pool_sizes=self.pool_sizes,
                                  axis_name=self.axis_name,
                                  dtype=self.dtype)(c5, train)
        y = FPNModule(self.num_outputs, fpn_dim=self.fpn_dim,
                      axis_name=self.axis_name, dtype=self.dtype)((c2, c3, c4, c5), train)
        return resize_bilinear(y, out_size).astype(jnp.float32)


class PSPNet(nn.Module):
    """Dilated-ResNet PSPNet with the classic PPM + conv classifier head
    and an optional auxiliary head on the /8 stage-3 features
    (reference `models/pspnet_caffe.py:238-338`).

    Call with `with_aux=True` during training to also get the auxiliary
    logits (for the deep-supervision loss)."""

    num_outputs: int
    layer: int = 101
    pool_sizes: Tuple[int, ...] = (1, 2, 3, 6)
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True, with_aux: bool = False,
                 output_size=None):
        input_size = tuple(output_size) if output_size else x.shape[1:3]
        feats = ResNetBackbone(
            layer=self.layer,
            deep_stem=True,
            stage_strides=(1, 2, 1, 1),
            stage_dilations=(1, 1, 2, 4),
            axis_name=self.axis_name, dtype=self.dtype)(x, train)
        _, _, c4, c5 = feats
        y = PyramidPoolingModule(pool_sizes=self.pool_sizes,
                                 axis_name=self.axis_name,
                                 dtype=self.dtype)(c5, train)
        y = nn.Conv(512, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.relu(SyncBatchNorm(axis_name=self.axis_name,
                                      dtype=self.dtype)(y, train))
        y = nn.Dropout(0.1, deterministic=not train)(y)
        y = nn.Conv(self.num_outputs, (1, 1), dtype=self.dtype)(y)
        y = resize_bilinear(y, input_size).astype(jnp.float32)
        # the aux branch is always traced so its params exist regardless of
        # `with_aux`; when unused XLA dead-code-eliminates it.
        aux = nn.Conv(256, (3, 3), padding="SAME", use_bias=False,
                      dtype=self.dtype)(c4)
        aux = nn.relu(SyncBatchNorm(axis_name=self.axis_name,
                                      dtype=self.dtype)(aux, train))
        aux = nn.Dropout(0.1, deterministic=not train)(aux)
        aux = nn.Conv(self.num_outputs, (1, 1), dtype=self.dtype)(aux)
        aux = resize_bilinear(aux, input_size).astype(jnp.float32)
        if not with_aux:
            return y
        return y, aux
