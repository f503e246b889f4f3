"""Spatially-sharded forward: output parity with unsharded execution."""

import numpy as np

import jax
import jax.numpy as jnp

from mergenet_tpu.models.unet import UNet
from mergenet_tpu.models import init_model
from mergenet_tpu.parallel import make_mesh
from mergenet_tpu.parallel.spatial import build_sharded_forward
from mergenet_tpu.parallel.mesh import batch_sharding


def test_spatial_forward_matches_unsharded():
    model = UNet(3, 2, depth=2, start_filts=8)
    rng = jax.random.PRNGKey(0)
    params, batch_stats = init_model(model, rng, (1, 32, 32, 3))
    variables = {"params": params, "batch_stats": batch_stats}
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))

    ref = model.apply(variables, imgs, train=False)
    ref = np.asarray(jax.nn.sigmoid(ref))

    mesh = make_mesh(data=2, spatial=4)
    fwd = build_sharded_forward(model, mesh)
    imgs_sh = jax.device_put(imgs, batch_sharding(mesh))
    out = np.asarray(fwd(variables, imgs_sh))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)
