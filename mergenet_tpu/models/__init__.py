"""Model zoo factory.

API parity with reference `models/__init__.py:9-50` (`get_model`), with the
same arch-string grammar: `fcn{8,16,32}_resnet{18,34,50,101,152}`,
`fcn{8,16,32}_vgg16`, `unet`, `pspnet`, `pspfpnet`, `upernet`.

Models are Flax modules in NHWC: forward maps (N, H, W, 3) ->
(N, H, W, num_classes + num_offsets) logits.  Pass `axis_name='data'` to get
cross-replica (synchronized) batch-norm statistics under shard_map/pmap.
"""

import jax
import jax.numpy as jnp

from .unet import UNet
from .fcn import FCNResNet, FCNVGG16
from .pspnet import PSPFPNet, UperNet, PSPNet, PyramidPoolingModule, FPNModule
from .resnet import ResNetBackbone
from .vgg import VGG16Backbone
from .tiling import tile_predict

VALID_ARCHS = (
    ["fcn{}_resnet{}".format(x, y)
     for x in [8, 16, 32] for y in [18, 34, 50, 101, 152]]
    + ["fcn{}_vgg16".format(x) for x in [8, 16, 32]]
    + ["unet", "unet_small", "pspnet", "pspfpnet", "upernet"]
)


def get_model(num_classes, num_offsets, arch, pretrain=False,
              axis_name=None, dtype=None, verbose=True, **model_kwargs):
    """Build a model by arch string; returns a Flax module.

    Extra `model_kwargs` pass through to the arch's constructor (e.g.
    `ref_head=True` on the vgg16 archs for exact forward parity with
    imported reference FCN-VGG16 checkpoints, models/fcn.py).

    `dtype` selects the compute precision (e.g. jnp.bfloat16 for
    mixed-precision training — params and BN stats stay float32, logits are
    cast back to float32).

    `pretrain` is accepted for API parity; Flax modules hold no state, so
    weights load at init time: `utils.weight_import.load_pretrained(params,
    batch_stats, path, arch)` maps torch checkpoints (torchvision-style
    backbones or full reference state dicts) onto the param trees — the
    train CLI wires `--pretrain` to it via `resolve_pretrained_path`.
    """
    if arch not in VALID_ARCHS:
        raise ValueError("Supported models are: {}\nbut given {}".format(
            VALID_ARCHS, arch))
    num_outputs = num_classes + num_offsets
    if arch == "unet":
        model = UNet(num_classes, num_offsets, axis_name=axis_name,
                     dtype=dtype, **model_kwargs)
    elif arch == "unet_small":
        # lightweight variant for smoke tests and quick experiments
        model = UNet(num_classes, num_offsets, depth=3, start_filts=8,
                     axis_name=axis_name, dtype=dtype, **model_kwargs)
    elif "vgg16" in arch:
        scale = int(arch.split("_")[0][3:])
        model = FCNVGG16(num_outputs, scale=scale, axis_name=axis_name,
                         dtype=dtype, **model_kwargs)
    elif arch.startswith("fcn"):
        names = arch.split("_")
        scale = int(names[0][3:])
        layer = int(names[1][6:])
        model = FCNResNet(num_outputs, scale=scale, layer=layer,
                          axis_name=axis_name, dtype=dtype, **model_kwargs)
    elif "fpnet" in arch:
        model = PSPFPNet(num_outputs, layer=50, fpn_dim=256,
                         axis_name=axis_name, dtype=dtype, **model_kwargs)
    elif arch == "pspnet":
        model = PSPNet(num_outputs, layer=101, axis_name=axis_name,
                       dtype=dtype, **model_kwargs)
    elif arch == "upernet":
        model = UperNet(num_outputs, layer=50, fpn_dim=512,
                        axis_name=axis_name, dtype=dtype, **model_kwargs)
    return model


def probs_at(model, variables, x, size):
    """Sigmoid probabilities at spatial `size` = (h, w) for batch `x`.

    Models whose `__call__` accepts `output_size` (the pyramid/FCN
    families) emit logits at the target size directly — skipping the
    full-res logits round trip saves ~6 ms/frame at 1024x2048; others
    run at input resolution and the probabilities are bilinear-resized.
    Support is detected by SIGNATURE (not try/except TypeError, which
    would silently mask a genuine TypeError raised inside the model and
    serve the numerically different resize path)."""
    import inspect
    params = inspect.signature(type(model).__call__).parameters
    if "output_size" in params:
        logits = model.apply(variables, x, train=False,
                             output_size=tuple(size))
        return jax.nn.sigmoid(logits.astype(jnp.float32))
    logits = model.apply(variables, x, train=False)
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    return jax.image.resize(
        probs, (probs.shape[0],) + tuple(size) + (probs.shape[-1],),
        "bilinear")


def logits_at(model, variables, x, size):
    """f32 LOGITS at spatial `size`, or None when the model lacks
    `output_size` support (the fallback resize path is defined on
    probabilities — resizing logits is a different function — so those
    models must go through `probs_at`).

    Serving fast path: paired with `decode_hierarchical(...,
    from_logits=True)` this skips the sigmoid -> clip -> log round trip
    over all C+O planes per frame (`decoder/device.py::_log_domain`)."""
    import inspect
    params = inspect.signature(type(model).__call__).parameters
    if "output_size" not in params:
        return None
    logits = model.apply(variables, x, train=False,
                         output_size=tuple(size))
    return logits.astype(jnp.float32)


def init_model(model, rng, input_shape=(1, 64, 64, 3), train=False):
    """Initialize model variables; returns (params, batch_stats).

    `input_shape` only fixes the init trace; convs are shape-polymorphic so
    the same params serve any spatial size."""
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros(input_shape, jnp.float32), train=train)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return params, batch_stats


def param_count(params):
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
