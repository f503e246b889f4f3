"""Spatially-sharded full-resolution inference.

The TPU-native replacement for the reference's big-input strategies
(`tile_predict` sliding windows, decode-at-reduced-size): shard the image's
height dimension across the mesh's 'spatial' axis and jit the forward —
GSPMD inserts halo exchanges for every convolution across the sharded dim,
so one full-resolution forward runs distributed with no Python-level tiling
(the convnet analogue of context/sequence parallelism).
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import batch_sharding


def build_sharded_forward(model, mesh, apply_sigmoid=True, dtype=None):
    """Returns fwd(variables, imgs) jitted over `mesh` with imgs sharded
    (batch over 'data', H over 'spatial') and outputs sharded the same way.

    Args:
        model: a Flax module with (N, H, W, 3) -> (N, H, W, C) apply.
        mesh: jax.sharding.Mesh with 'data' and 'spatial' axes.
        apply_sigmoid: emit probabilities instead of logits.
        dtype: compute dtype (e.g. jnp.bfloat16); params are cast inside.
    """
    sharding = batch_sharding(mesh)
    repl = NamedSharding(mesh, P())

    def fwd(variables, imgs):
        if dtype is not None:
            variables = jax.tree_util.tree_map(
                lambda a: a.astype(dtype)
                if a.dtype == jnp.float32 else a, variables)
            imgs = imgs.astype(dtype)
        out = model.apply(variables, imgs, train=False)
        out = out.astype(jnp.float32)
        if apply_sigmoid:
            out = jax.nn.sigmoid(out)
        return out

    return jax.jit(fwd, in_shardings=(repl, sharding),
                   out_shardings=sharding)
