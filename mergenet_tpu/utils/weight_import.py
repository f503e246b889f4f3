"""Map reference torch checkpoints onto the Flax model trees.

The reference trains from torchvision / MIT-sceneparsing pretrained ResNets
(`/root/reference/models/resnet.py:21-24,214-222`) and saves full-model
state dicts via `save_checkpoint` (`utils/train_utils.py:286-295`).  This
module turns the flat torch-keyed dict produced by
`checkpoint.import_torch_checkpoint` (conv kernels already HWIO) into
`(params, batch_stats)` updates for our Flax modules, so

  * reference-trained `.pth.tar` checkpoints run through the TPU stack
    (forward-parity validation, SURVEY §7 step 4), and
  * ImageNet-pretrained backbones initialize training
    (`get_model(..., pretrain=...)` / `train.py --pretrain`).

The mapping is generated programmatically from the arch metadata — one
(torch module prefix, flax path, kind) entry per conv/BN — and applied
with shape checks.  Kinds ending in '?' are optional (torch downsample
branches exist only on shape-changing blocks).
"""

import os

import numpy as np

from ..models.resnet import STAGE_BLOCKS, EXPANSION

# leaf-name translation
_CONV_LEAVES = {"weight": ("params", "kernel"), "bias": ("params", "bias")}
_BN_LEAVES = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}


def resnet_mapping(layer, deep_stem=False, tpre="", fpre=""):
    """(torch prefix, flax prefix, kind) entries for a ResNet backbone.

    torch naming follows torchvision (`conv1/bn1/layer{1..4}.{i}.conv{j}`)
    or the reference deep-stem variant (`conv1..3/bn1..3`, reference
    `models/resnet.py:109-118`); flax naming follows
    `models/resnet.py::ResNetBackbone` (blocks auto-numbered flat across
    stages)."""
    m = []
    if deep_stem:
        for i in range(3):
            m.append((tpre + "conv{}".format(i + 1),
                      fpre + "Conv_{}".format(i), "conv"))
            m.append((tpre + "bn{}".format(i + 1),
                      fpre + "SyncBatchNorm_{}".format(i), "bn"))
    else:
        m.append((tpre + "conv1", fpre + "Conv_0", "conv"))
        m.append((tpre + "bn1", fpre + "SyncBatchNorm_0", "bn"))
    blocks = STAGE_BLOCKS[layer]
    basic = EXPANSION[layer] == 1
    block_name = "BasicBlock_{}" if basic else "Bottleneck_{}"
    n_conv = 2 if basic else 3
    j = 0
    for s in range(4):
        for i in range(blocks[s]):
            tb = tpre + "layer{}.{}.".format(s + 1, i)
            fb = fpre + block_name.format(j) + "/"
            for c in range(n_conv):
                m.append((tb + "conv{}".format(c + 1),
                          fb + "Conv_{}".format(c), "conv"))
                m.append((tb + "bn{}".format(c + 1),
                          fb + "SyncBatchNorm_{}".format(c), "bn"))
            m.append((tb + "downsample.0",
                      fb + "Conv_{}".format(n_conv), "conv?"))
            m.append((tb + "downsample.1",
                      fb + "SyncBatchNorm_{}".format(n_conv), "bn?"))
            j += 1
    return m


def _ppm_mapping(tpre="ppm.", fpre="PyramidPoolingModule_0/", n_pools=4):
    """torch `ppm.features.{k}` = Sequential(pool, conv, bn, relu)
    (reference `models/pspnet.py:13-21`)."""
    m = []
    for k in range(n_pools):
        m.append((tpre + "features.{}.1".format(k),
                  fpre + "Conv_{}".format(k), "conv"))
        m.append((tpre + "features.{}.2".format(k),
                  fpre + "SyncBatchNorm_{}".format(k), "bn"))
    return m


def _fpn_mapping(tpre="fpn_module.", fpre="FPNModule_0/", n_levels=4):
    """torch FPNModule naming (reference `models/pspnet.py:39-64`)."""
    m = []
    for k in range(n_levels):
        m.append((tpre + "fpn_in.{}.0".format(k),
                  fpre + "fpn_in_{}".format(k), "conv"))
        m.append((tpre + "fpn_out.{}.0".format(k),
                  fpre + "fpn_out_{}".format(k), "conv"))
    m.append((tpre + "final_conv.0", fpre + "Conv_0", "conv"))
    m.append((tpre + "final_conv.1", fpre + "SyncBatchNorm_0", "bn"))
    m.append((tpre + "final_conv.3", fpre + "Conv_1", "conv"))
    return m


def unet_mapping(depth=5):
    """Reference UNet naming (`models/Unet.py:44-223`: `down_convs.{i}`
    with conv1/conv2/bn1/bn2, `up_convs.{i}` with a transpose upconv +
    conv1/conv2/bn1/bn2, `conv_final`) onto our `models/unet.py` tree
    (default transpose/concat modes)."""
    m = []
    for i in range(depth):
        tb = "down_convs.{}.".format(i)
        fb = "DownConv_{}/".format(i)
        for c in (1, 2):
            m.append((tb + "conv{}".format(c),
                      fb + "Conv_{}".format(c - 1), "conv"))
            m.append((tb + "bn{}".format(c),
                      fb + "SyncBatchNorm_{}".format(c - 1), "bn"))
    for i in range(depth - 1):
        tb = "up_convs.{}.".format(i)
        fb = "UpConv_{}/".format(i)
        m.append((tb + "upconv", fb + "ConvTranspose_0", "convT"))
        for c in (1, 2):
            m.append((tb + "conv{}".format(c),
                      fb + "Conv_{}".format(c - 1), "conv"))
            m.append((tb + "bn{}".format(c),
                      fb + "SyncBatchNorm_{}".format(c - 1), "bn"))
    m.append(("conv_final", "Conv_0", "conv"))
    return m


_VGG16_BLOCK_CONVS = ((0, 2), (0, 2), (0, 2, 4), (0, 2, 4), (0, 2, 4))
# torchvision vgg16.features conv indices, used by the plain-backbone route
_VGG16_FEATURE_CONVS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def fcn_vgg16_mapping(scale=8):
    """Reference FCNVGG16 naming (`models/fcn.py:86-107`: torchvision
    vgg16.features sliced into `block{1..5}` Sequentials, head
    `score_32s` = Sequential(7x7 conv, relu, dropout, 1x1 conv, relu,
    dropout, 1x1 conv), plus `score_16s`/`score_8s` 1x1 convs) onto our
    `models/fcn.py::FCNVGG16` tree.  Use with `FCNVGG16(ref_head=True)`
    for exact forward geometry (the reference 7x7 is VALID-padded)."""
    m = []
    j = 0
    for b, convs in enumerate(_VGG16_BLOCK_CONVS):
        for i in convs:
            m.append(("block{}.{}".format(b + 1, i),
                      "VGG16Backbone_0/Conv_{}".format(j), "conv"))
            j += 1
    m.append(("score_32s.0", "Conv_0", "conv"))   # 7x7 fc-conv
    m.append(("score_32s.3", "Conv_1", "conv"))   # 1x1 4096
    m.append(("score_32s.6", "score_32s", "conv"))
    if scale <= 16:
        m.append(("score_16s", "score_16s", "conv"))
    if scale <= 8:
        m.append(("score_8s", "score_8s", "conv"))
    return m


def vgg16_backbone_mapping():
    """Plain torchvision vgg16 state dict (`features.{i}.*`) onto the
    VGG16Backbone subtree (the `--pretrain` route for fcn*_vgg16)."""
    return [("features.{}".format(fi),
             "VGG16Backbone_0/Conv_{}".format(j), "conv")
            for j, fi in enumerate(_VGG16_FEATURE_CONVS)]


def model_mapping(arch, layer=None):
    """Full-model mapping for a reference checkpoint of `arch`."""
    if arch in ("unet", "unet_small"):
        return unet_mapping(5 if arch == "unet" else 3)
    if "fpnet" in arch:
        layer = layer or 50
        return (resnet_mapping(layer, False, "resnet.",
                               "ResNetBackbone_0/")
                + _ppm_mapping() + _fpn_mapping())
    if arch == "upernet":
        layer = layer or 50
        return (resnet_mapping(layer, True, "resnet.",
                               "ResNetBackbone_0/")
                + _ppm_mapping() + _fpn_mapping())
    if arch.startswith("fcn") and "vgg16" in arch:
        return fcn_vgg16_mapping(int(arch.split("_")[0][3:]))
    if arch.startswith("fcn") and "resnet" in arch:
        layer = layer or int(arch.split("resnet")[1])
        m = resnet_mapping(layer, False, "resnet.", "ResNetBackbone_0/")
        # score heads (reference models/fcn.py:20-28; ours fcn.py)
        scale = int(arch.split("_")[0][3:])
        m.append(("score_32s", "score_32s", "conv"))
        if scale <= 16:
            m.append(("score_16s", "score_16s", "conv"))
        if scale <= 8:
            m.append(("score_8s", "score_8s", "conv"))
        return m
    if arch == "pspnet":
        # the reference's PSPNet torch checkpoints come from its caffemodel
        # converter (`convert_caffe_to_pytorch.py:22-34`) and use caffe-
        # derived module names (`pspnet_caffe.py:238-338`), not `resnet.*`;
        # the supported import route is the original caffemodel via
        # `caffe_import.caffemodel_to_npz` + `apply_caffe_weights`
        # (`--caffe-weights` on the inference CLIs).
        raise ValueError(
            "arch 'pspnet': full torch checkpoints are not mapped; import "
            "the caffemodel directly (utils.caffe_import.caffemodel_to_npz "
            "+ weight_import.apply_caffe_weights, or --caffe-weights on "
            "class_infer.py). Plain ResNet-101 backbone state dicts load "
            "via backbone_mapping.")
    raise ValueError("no torch mapping for arch '{}'".format(arch))


def backbone_mapping(arch, layer=None):
    """Backbone-only mapping for a PLAIN torchvision-style ResNet state
    dict (keys `conv1...` with no `resnet.` prefix) — the pretrained-
    weights format the reference downloads (`models/resnet.py:214-222`)."""
    if arch.startswith("fcn") and "vgg16" in arch:
        return vgg16_backbone_mapping()
    if "fpnet" in arch or arch.startswith("fcn"):
        layer = layer or (50 if "fpnet" in arch
                          else int(arch.split("resnet")[1]))
        return resnet_mapping(layer, False, "", "ResNetBackbone_0/")
    if arch in ("upernet", "pspnet"):
        layer = layer or (50 if arch == "upernet" else 101)
        return resnet_mapping(layer, True, "", "ResNetBackbone_0/")
    raise ValueError("no backbone mapping for arch '{}'".format(arch))


def _get_path(tree, path):
    node = tree
    for part in path.split("/"):
        if node is None or part not in node:
            return None
        node = node[part]
    return node


def _set_path(tree, path, leaf, value):
    node = tree
    parts = path.split("/")
    for part in parts:
        node = node[part]
    if leaf not in node:
        raise KeyError("flax leaf {}/{} not found".format(path, leaf))
    old = node[leaf]
    if tuple(old.shape) != tuple(value.shape):
        raise ValueError("shape mismatch at {}/{}: flax {} vs torch {}"
                         .format(path, leaf, old.shape, value.shape))
    node[leaf] = value.astype(np.asarray(old).dtype)


def _to_mutable(tree):
    if hasattr(tree, "unfreeze"):
        tree = tree.unfreeze()
    return {k: _to_mutable(v) if isinstance(v, dict) or hasattr(v, "keys")
            else v for k, v in dict(tree).items()}


def apply_torch_weights(params, batch_stats, flat, mapping):
    """Copy `flat` (torch-keyed, convs HWIO) into the Flax trees.

    Returns (params, batch_stats, report) where report lists loaded /
    skipped-optional entries and torch keys that were never consumed.
    Raises on a required entry missing from `flat` or on shape mismatch.
    """
    params = _to_mutable(params)
    batch_stats = _to_mutable(batch_stats)
    used = set()
    loaded, skipped = [], []
    for tpre, fpath, kind in mapping:
        optional = kind.endswith("?")
        kind = kind.rstrip("?")
        leaves = _BN_LEAVES if kind == "bn" else _CONV_LEAVES
        present = any(tpre + "." + ln in flat for ln in leaves)
        if not present:
            if optional:
                skipped.append(tpre)
                continue
            raise KeyError("torch checkpoint is missing '{}.*'".format(tpre))
        # BN path: flax nests the actual BatchNorm one level down
        fp = fpath + "/BatchNorm_0" if kind == "bn" else fpath
        for ln, (coll, fl) in leaves.items():
            tk = tpre + "." + ln
            if tk not in flat:
                continue  # e.g. bias-free conv
            tree = params if coll == "params" else batch_stats
            value = np.asarray(flat[tk])
            if kind == "convT" and ln == "weight":
                # torch ConvTranspose2d stores (in, out, kH, kW);
                # import_torch_checkpoint applied the regular-conv
                # transpose, leaving (kH, kW, out, in).  Flax
                # ConvTranspose wants (kH, kW, in, out) with the spatial
                # taps FLIPPED (verified numerically vs torch)
                value = value.transpose(0, 1, 3, 2)[::-1, ::-1].copy()
            _set_path(tree, fp, fl, value)
            used.add(tk)
        loaded.append(tpre)
    report = {
        "loaded": loaded,
        "skipped_optional": skipped,
        "unused_torch_keys": sorted(
            k for k in flat
            if k not in used and not k.startswith("fc.")
            and ".num_batches_tracked" not in k),
    }
    return params, batch_stats, report


def load_pretrained(params, batch_stats, path, arch, layer=None,
                    verbose=True):
    """Load a local torch checkpoint file into (params, batch_stats).

    Auto-detects the format: keys starting with `resnet.` = a full
    reference model checkpoint (`model_mapping`); otherwise a plain
    torchvision-style backbone (`backbone_mapping`).  Returns the updated
    trees."""
    from .checkpoint import import_torch_checkpoint
    flat, _ = import_torch_checkpoint(path)
    full = any(k.startswith("resnet.") or k.startswith("block1.")
               for k in flat)
    if arch in ("unet", "unet_small") or any(
            k.startswith("down_convs.") for k in flat):
        # UNet checkpoints have no backbone/full split
        full = True
        mapping = model_mapping(arch if arch.startswith("unet")
                                else "unet")
    else:
        mapping = (model_mapping(arch, layer) if full
                   else backbone_mapping(arch, layer))
    params, batch_stats, report = apply_torch_weights(
        params, batch_stats, flat, mapping)
    if verbose:
        print("loaded {} torch modules from {} ({} mode); {} unused keys"
              .format(len(report["loaded"]), path,
                      "full-model" if full else "backbone",
                      len(report["unused_torch_keys"])))
    return params, batch_stats


def resolve_pretrained_path(arch, pretrain):
    """Reference-compatible pretrained-weights lookup: `pretrain` may be a
    path, or True to search `./pretrained/` (the reference's download cache
    dir, `models/resnet.py:214-222`) and `$MERGENET_PRETRAINED_DIR`."""
    if isinstance(pretrain, str):
        return pretrain
    if not pretrain:
        return None
    layer = 50
    if "resnet" in arch:
        layer = int(arch.split("resnet")[1])
    elif arch == "pspnet":
        layer = 101
    names = ["{}.pth.tar".format(arch), "{}.pth".format(arch),
             "resnet{}.pth.tar".format(layer), "resnet{}.pth".format(layer)]
    dirs = [os.environ.get("MERGENET_PRETRAINED_DIR", ""), "./pretrained"]
    for d in dirs:
        if not d:
            continue
        for n in names:
            p = os.path.join(d, n)
            if os.path.exists(p):
                return p
    return None


def caffe_pspnet_mapping(layer=101):
    """(caffe conv-layer name, flax conv path, flax BN path|None) entries
    for the released caffe PSPNet (reference `pspnet_caffe.py:462-490`
    naming: stem conv1_{1..3}, residual conv{2..5}_{i}_{1x1_reduce,3x3,
    1x1_increase}(+_1_1x1_proj), PPM conv5_3_pool{1,2,3,6}_conv, head
    conv5_4/conv6, aux conv4_{n+1}/conv6_1; every conv's BN is
    '<name>/bn')."""
    blocks = STAGE_BLOCKS[layer]
    rb = "ResNetBackbone_0/"
    m = []
    for i, cn in enumerate(("conv1_1_3x3_s2", "conv1_2_3x3",
                            "conv1_3_3x3")):
        m.append((cn, rb + "Conv_{}".format(i),
                  rb + "SyncBatchNorm_{}".format(i)))
    j = 0
    for s in range(4):
        prefix = "conv{}".format(s + 2)
        for i in range(1, blocks[s] + 1):
            fb = rb + "Bottleneck_{}/".format(j)
            m.append(("{}_{}_1x1_reduce".format(prefix, i),
                      fb + "Conv_0", fb + "SyncBatchNorm_0"))
            m.append(("{}_{}_3x3".format(prefix, i),
                      fb + "Conv_1", fb + "SyncBatchNorm_1"))
            m.append(("{}_{}_1x1_increase".format(prefix, i),
                      fb + "Conv_2", fb + "SyncBatchNorm_2"))
            if i == 1:
                m.append(("{}_1_1x1_proj".format(prefix),
                          fb + "Conv_3", fb + "SyncBatchNorm_3"))
            j += 1
    ppm = "PyramidPoolingModule_0/"
    for k, ps in enumerate((1, 2, 3, 6)):
        m.append(("conv5_3_pool{}_conv".format(ps),
                  ppm + "Conv_{}".format(k),
                  ppm + "SyncBatchNorm_{}".format(k)))
    m.append(("conv5_4", "Conv_0", "SyncBatchNorm_0"))
    m.append(("conv6", "Conv_1", None))
    m.append(("conv4_{}".format(blocks[2] + 1), "Conv_2",
              "SyncBatchNorm_1"))
    m.append(("conv6_1", "Conv_3", None))
    return m


def apply_caffe_weights(params, batch_stats, npz, layer=101,
                        skip_head=False):
    """Load a `caffemodel_to_npz` archive into a `PSPNet` Flax tree.

    npz keys are '<layer>.<i>' (convs already HWIO).  BNData blob order is
    gamma, beta, running_mean, running_var (reference
    `pspnet_caffe.py:352-357`).  `skip_head=True` loads only the backbone
    + PPM (for transfer to a different number of output channels).
    Returns (params, batch_stats, report)."""
    params = _to_mutable(params)
    batch_stats = _to_mutable(batch_stats)
    loaded, skipped = [], []
    used = set()
    for cname, cpath, bnpath in caffe_pspnet_mapping(layer):
        if skip_head and cpath in ("Conv_1", "Conv_3"):
            skipped.append(cname)
            continue
        wkey = cname + ".0"
        if wkey not in npz:
            raise KeyError("caffemodel is missing layer '{}'".format(cname))
        _set_path(params, cpath, "kernel", np.asarray(npz[wkey]))
        used.add(wkey)
        bkey = cname + ".1"
        if bnpath is None and bkey in npz:
            _set_path(params, cpath, "bias", np.asarray(npz[bkey]))
            used.add(bkey)
        if bnpath is not None:
            bn = cname + "/bn"
            gamma, beta, mean, var = (np.asarray(npz[bn + ".%d" % i])
                                      for i in range(4))
            bp = bnpath + "/BatchNorm_0"
            _set_path(params, bp, "scale", gamma)
            _set_path(params, bp, "bias", beta)
            _set_path(batch_stats, bp, "mean", mean)
            _set_path(batch_stats, bp, "var", var)
            used.update(bn + ".%d" % i for i in range(4))
        loaded.append(cname)
    report = {"loaded": loaded, "skipped": skipped,
              "unused_npz_keys": sorted(k for k in npz.files
                                        if k not in used)}
    return params, batch_stats, report
