"""Reference-compatible import surface: top-level `models` package
(`from models import get_model`) re-exporting the mergenet_tpu model zoo."""
from mergenet_tpu.models import (  # noqa: F401
    get_model, init_model, param_count, tile_predict, VALID_ARCHS,
    UNet, FCNResNet, FCNVGG16, PSPFPNet, UperNet, PSPNet,
    ResNetBackbone, VGG16Backbone)
