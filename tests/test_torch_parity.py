"""Numerical parity with torch layers: validates the weight-import
conventions (conv OIHW -> HWIO transpose, BN running-stats mapping) used
by `utils/checkpoint.import_torch_checkpoint` so reference-trained
checkpoints load correctly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from flax import linen as nn

from mergenet_tpu.utils.checkpoint import import_torch_checkpoint


def test_conv_bn_relu_parity():
    tconv = torch.nn.Conv2d(3, 8, 3, padding=1)
    tbn = torch.nn.BatchNorm2d(8, eps=1e-5)
    tbn.eval()
    with torch.no_grad():
        tbn.running_mean.normal_()
        tbn.running_var.uniform_(0.5, 2.0)
        tbn.weight.normal_()
        tbn.bias.normal_()
    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        ref = torch.relu(tbn(tconv(x))).numpy()  # NCHW

    # flax twin with imported weights
    class Block(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-5)(x)
            return nn.relu(x)

    model = Block()
    x_nhwc = jnp.asarray(np.moveaxis(x.numpy(), 1, -1))
    variables = model.init(jax.random.PRNGKey(0), x_nhwc)
    params = {
        "Conv_0": {
            "kernel": jnp.asarray(np.transpose(
                tconv.weight.detach().numpy(), (2, 3, 1, 0))),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        },
        "BatchNorm_0": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
        },
    }
    batch_stats = {
        "BatchNorm_0": {
            "mean": jnp.asarray(tbn.running_mean.numpy()),
            "var": jnp.asarray(tbn.running_var.numpy()),
        },
    }
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      x_nhwc)
    out_nchw = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(out_nchw, ref, atol=2e-5, rtol=1e-4)


def test_import_torch_checkpoint(tmp_path):
    sd = {
        "conv.weight": torch.randn(8, 3, 3, 3),
        "conv.bias": torch.randn(8),
        "bn.running_mean": torch.randn(8),
    }
    path = str(tmp_path / "ckpt.pth.tar")
    torch.save({"model_state": sd, "epoch": 7, "best_iou": 0.4,
                "offset": [(1, 0)]}, path)
    flat, meta = import_torch_checkpoint(path)
    assert flat["conv.weight"].shape == (3, 3, 3, 8)  # HWIO
    np.testing.assert_allclose(
        flat["conv.weight"],
        np.transpose(sd["conv.weight"].numpy(), (2, 3, 1, 0)))
    assert meta["epoch"] == 7
    assert meta["offset"] == [(1, 0)]
