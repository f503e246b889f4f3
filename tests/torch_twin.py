"""Minimal torch models with reference-compatible state-dict naming.

Used ONLY by the weight-import parity tests: they generate randomly-
initialized torch checkpoints whose key structure matches what the
reference framework saves (torchvision ResNet naming `conv1/bn1/
layer{s}.{i}.conv{j}`; PSPFPNet naming `resnet./ppm.features.{k}/
fpn_module.*`, reference `models/pspnet.py:89-140`; deep-stem variant
`models/resnet.py:104-222`), so `mergenet_tpu.utils.weight_import` can be
validated end-to-end (state dict -> Flax tree -> forward parity) with no
downloads.  This is an interop fixture, not a port of the reference.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def _bottleneck(inp, width, stride=1, dilation=1):
    out = width * 4
    block = nn.Module()
    block.conv1 = nn.Conv2d(inp, width, 1, bias=False)
    block.bn1 = nn.BatchNorm2d(width)
    block.conv2 = nn.Conv2d(width, width, 3, stride=stride,
                            padding=dilation, dilation=dilation, bias=False)
    block.bn2 = nn.BatchNorm2d(width)
    block.conv3 = nn.Conv2d(width, out, 1, bias=False)
    block.bn3 = nn.BatchNorm2d(out)
    if stride != 1 or inp != out:
        block.downsample = nn.Sequential(
            nn.Conv2d(inp, out, 1, stride=stride, bias=False),
            nn.BatchNorm2d(out))
    else:
        block.downsample = None

    def forward(x):
        r = x if block.downsample is None else block.downsample(x)
        y = F.relu(block.bn1(block.conv1(x)))
        y = F.relu(block.bn2(block.conv2(y)))
        y = block.bn3(block.conv3(y))
        return F.relu(y + r)

    block.forward = forward
    return block


class TorchResNet(nn.Module):
    """Bottleneck-only ResNet (50/101 shapes) with torchvision naming, plus
    the deep-stem variant; returns the 4-stage pyramid."""

    def __init__(self, stage_blocks=(3, 4, 6, 3), deep_stem=False,
                 stage_strides=(1, 2, 2, 2), stage_dilations=(1, 1, 1, 1)):
        super().__init__()
        self.deep_stem = deep_stem
        if deep_stem:
            self.conv1 = nn.Conv2d(3, 64, 3, stride=2, padding=1,
                                   bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.conv2 = nn.Conv2d(64, 64, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(64)
            self.conv3 = nn.Conv2d(64, 128, 3, padding=1, bias=False)
            self.bn3 = nn.BatchNorm2d(128)
            inp = 128
        else:
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3,
                                   bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            inp = 64
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        widths = (64, 128, 256, 512)
        for s, nblocks in enumerate(stage_blocks):
            blocks = []
            for i in range(nblocks):
                stride = stage_strides[s] if i == 0 else 1
                blocks.append(_bottleneck(inp, widths[s], stride,
                                          stage_dilations[s]))
                inp = widths[s] * 4
            setattr(self, "layer{}".format(s + 1), nn.Sequential(*blocks))

    def forward(self, x):
        if self.deep_stem:
            x = F.relu(self.bn1(self.conv1(x)))
            x = F.relu(self.bn2(self.conv2(x)))
            x = F.relu(self.bn3(self.conv3(x)))
        else:
            x = F.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        feats = []
        for s in range(4):
            x = getattr(self, "layer{}".format(s + 1))(x)
            feats.append(x)
        return feats


class TorchPSPFPNet(nn.Module):
    """Reference-shaped PSPFPNet twin: `resnet.` + `ppm.` + `fpn_module.`
    state-dict keys, same dataflow (PPM on c5, top-down FPN, 4-level
    concat)."""

    def __init__(self, num_outputs, stage_blocks=(2, 2, 2, 2),
                 fpn_dim=64, deep_stem=False):
        super().__init__()
        self.resnet = TorchResNet(stage_blocks, deep_stem=deep_stem)
        in_dims = [256, 512, 1024, 2048]
        ppm_in = in_dims[-1]
        pool_sizes = (1, 2, 3, 6)
        out_dim = ppm_in // len(pool_sizes)
        self.pool_sizes = pool_sizes
        ppm = nn.Module()
        ppm.features = nn.ModuleList([
            nn.Sequential(nn.AdaptiveAvgPool2d(s),
                          nn.Conv2d(ppm_in, out_dim, 1, bias=False),
                          nn.BatchNorm2d(out_dim), nn.ReLU())
            for s in pool_sizes])
        self.ppm = ppm
        in_dims[-1] = ppm_in * 2
        fpn = nn.Module()
        fpn.fpn_in = nn.ModuleList([
            nn.Sequential(nn.Conv2d(d, fpn_dim, 1, bias=False))
            for d in in_dims])
        fpn.fpn_out = nn.ModuleList([
            nn.Sequential(nn.Conv2d(fpn_dim, fpn_dim, 3, padding=1))
            for _ in in_dims])
        fpn.final_conv = nn.Sequential(
            nn.Conv2d(4 * fpn_dim, fpn_dim, 3, padding=1),
            nn.BatchNorm2d(fpn_dim), nn.ReLU(),
            nn.Conv2d(fpn_dim, num_outputs, 1))
        self.fpn_module = fpn

    def forward(self, x):
        size = x.shape[2:]
        c2, c3, c4, c5 = self.resnet(x)
        outs = [c5]
        for f in self.ppm.features:
            outs.append(F.interpolate(f(c5), c5.shape[2:], mode="bilinear",
                                      align_corners=False))
        c5 = torch.cat(outs, 1)
        feats = [c2, c3, c4, c5]
        lat = [self.fpn_module.fpn_in[i](f) for i, f in enumerate(feats)]
        last = lat[-1]
        pyramid = [self.fpn_module.fpn_out[-1](last)]
        for i in reversed(range(3)):
            last = lat[i] + F.interpolate(last, lat[i].shape[2:],
                                          mode="bilinear",
                                          align_corners=False)
            pyramid.append(self.fpn_module.fpn_out[i](last))
        pyramid.reverse()
        fused = [pyramid[0]] + [
            F.interpolate(p, pyramid[0].shape[2:], mode="bilinear",
                          align_corners=False) for p in pyramid[1:]]
        y = self.fpn_module.final_conv(torch.cat(fused, 1))
        return F.interpolate(y, size, mode="bilinear", align_corners=False)


class TorchUNet(nn.Module):
    """Reference-shaped UNet twin (`models/Unet.py:44-223` naming:
    down_convs.{i}.conv1/conv2/bn1/bn2, up_convs.{i}.upconv/conv1/.../bn2,
    conv_final); transpose-upconv + concat-merge modes."""

    def __init__(self, num_outputs, depth=3, start_filts=8):
        super().__init__()
        downs, ups = [], []
        ins = 3
        for i in range(depth):
            outs = start_filts * (2 ** i)
            d = nn.Module()
            d.conv1 = nn.Conv2d(ins, outs, 3, padding=1)
            d.conv2 = nn.Conv2d(outs, outs, 3, padding=1)
            d.bn1 = nn.BatchNorm2d(outs)
            d.bn2 = nn.BatchNorm2d(outs)
            d.pooling = i < depth - 1
            downs.append(d)
            ins = outs
        for i in range(depth - 1):
            outs = ins // 2
            u = nn.Module()
            u.upconv = nn.ConvTranspose2d(ins, outs, 2, stride=2)
            u.conv1 = nn.Conv2d(2 * outs, outs, 3, padding=1)
            u.conv2 = nn.Conv2d(outs, outs, 3, padding=1)
            u.bn1 = nn.BatchNorm2d(outs)
            u.bn2 = nn.BatchNorm2d(outs)
            ups.append(u)
            ins = outs
        self.down_convs = nn.ModuleList(downs)
        self.up_convs = nn.ModuleList(ups)
        self.conv_final = nn.Conv2d(ins, num_outputs, 1)

    def forward(self, x):
        skips = []
        for d in self.down_convs:
            x = F.relu(d.bn1(d.conv1(x)))
            x = F.relu(d.bn2(d.conv2(x)))
            skips.append(x)
            if d.pooling:
                x = F.max_pool2d(x, 2, 2)
        for i, u in enumerate(self.up_convs):
            x = u.upconv(x)
            x = torch.cat((x, skips[-(i + 2)]), 1)
            x = F.relu(u.bn1(u.conv1(x)))
            x = F.relu(u.bn2(u.conv2(x)))
        return self.conv_final(x)


class TorchFCNVGG16(nn.Module):
    """Reference-shaped FCNVGG16 twin (`models/fcn.py:80-137` naming:
    torchvision vgg16.features sliced into block{1..5} Sequentials with
    the original inner indices, head score_32s Sequential with a
    VALID-padded 7x7 fc-conv, score_16s/score_8s 1x1 taps)."""

    def __init__(self, num_outputs, scale=8, width=1.0):
        super().__init__()
        self.scale = scale

        def blk(ins, outs, n):
            layers = []
            for _ in range(n):
                layers += [nn.Conv2d(ins, outs, 3, padding=1),
                           nn.ReLU(inplace=True)]
                ins = outs
            layers.append(nn.MaxPool2d(2, 2))
            return nn.Sequential(*layers)

        w = lambda c: max(8, int(c * width))
        self.block1 = blk(3, w(64), 2)
        self.block2 = blk(w(64), w(128), 2)
        self.block3 = blk(w(128), w(256), 3)
        self.block4 = blk(w(256), w(512), 3)
        self.block5 = blk(w(512), w(512), 3)
        fc = w(4096)
        self.score_32s = nn.Sequential(
            nn.Conv2d(w(512), fc, 7), nn.ReLU(inplace=True), nn.Dropout2d(),
            nn.Conv2d(fc, fc, 1), nn.ReLU(inplace=True), nn.Dropout2d(),
            nn.Conv2d(fc, num_outputs, 1))
        if scale <= 16:
            self.score_16s = nn.Conv2d(w(512), num_outputs, 1)
        if scale <= 8:
            self.score_8s = nn.Conv2d(w(256), num_outputs, 1)

    def forward(self, x):
        size = x.shape[2:]
        up = lambda t, s: F.interpolate(t, s, mode="bilinear",
                                        align_corners=False)
        x = self.block3(self.block2(self.block1(x)))
        if self.scale <= 8:
            score_8s = self.score_8s(x)
        x = self.block4(x)
        if self.scale <= 16:
            score_16s = self.score_16s(x)
        x = self.block5(x)
        score = self.score_32s(x)
        if self.scale <= 16:
            score = score_16s + up(score, score_16s.shape[2:])
        if self.scale <= 8:
            score = score_8s + up(score, score_8s.shape[2:])
        return up(score, size)
