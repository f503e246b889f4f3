"""Flax VGG16 feature extractor, exposing the five conv-block outputs the
FCN heads tap (capability parity with torchvision vgg16.features as sliced
by reference `models/fcn.py:90-96`)."""

from typing import Optional

from flax import linen as nn

from .layers import max_pool

# (convs per block, channels)
_VGG16_CFG = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


def vgg_width(channels, width_mult):
    """Width-scaled channel count (min 8); width_mult=1 is torchvision."""
    return max(8, int(channels * width_mult))


class VGG16Backbone(nn.Module):
    """Returns the outputs of each of the 5 blocks, post-pool: strides
    2/4/8/16/32.  `width_mult` scales every block's channels (1.0 =
    torchvision vgg16; smaller for lightweight variants/tests)."""

    width_mult: float = 1.0
    axis_name: Optional[str] = None  # unused (VGG has no norm layers)
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        features = []
        for n_convs, width in _VGG16_CFG:
            for _ in range(n_convs):
                x = nn.relu(nn.Conv(vgg_width(width, self.width_mult),
                                    (3, 3), padding="SAME",
                                    dtype=self.dtype)(x))
            x = max_pool(x)
            features.append(x)
        return tuple(features)
