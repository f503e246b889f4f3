"""Device-mesh construction and sharding helpers.

The TPU-native replacement for the reference's entire distribution stack
(`models/modules/replicate.py` DataParallel + `comm.py` thread rendezvous):
we build a named `jax.sharding.Mesh` and annotate array shardings; XLA
inserts the collectives (over ICI within a slice, DCN across hosts).

Axes:
    data     — batch dimension (data parallelism; the DataParallel analogue)
    spatial  — image-height dimension (spatial partitioning: GSPMD inserts
               halo exchanges for convolutions over sharded spatial dims —
               the conv analogue of sequence/context parallelism)
    model    — channel dimension (tensor parallelism for very wide nets)

Cross-replica batch-norm needs no special code under pjit/GSPMD: batch
statistics are computed over the *global* (logically unsharded) batch, which
is exactly SyncBN semantics.
"""

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 0, spatial: int = 1, model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'spatial', 'model') mesh.

    `data=0` means "use all remaining devices on the data axis"."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == 0:
        assert n % (spatial * model) == 0, (n, spatial, model)
        data = n // (spatial * model)
    assert data * spatial * model == n, \
        "mesh {}x{}x{} != {} devices".format(data, spatial, model, n)
    dev_array = np.asarray(devices).reshape(data, spatial, model)
    return Mesh(dev_array, axis_names=("data", "spatial", "model"))


def data_axis_for_batch(batch_size: int, n_devices: Optional[int] = None):
    """Largest data-parallel axis size <= n_devices that divides
    `batch_size`, so every (drop_last) batch shards exactly.

    GSPMD requires the global batch to be divisible by the data axis; a
    recipe whose batch is smaller than (or not a multiple of) the device
    count uses a sub-mesh `make_mesh(data=dp, devices=devices[:dp])`
    instead of failing (the remaining devices idle — correctness over
    utilization at toy scales; at production scales batch is a multiple
    of the chip count and dp == n_devices)."""
    if n_devices is None:
        n_devices = len(jax.devices())
    dp = min(batch_size, n_devices)
    while dp > 1 and batch_size % dp:
        dp -= 1
    return dp


def batch_sharding(mesh: Mesh, spatial_axis: Optional[int] = 1):
    """Sharding for NHWC batches: batch over 'data', H over 'spatial'."""
    spec = [None, None, None, None]
    spec[0] = "data"
    if spatial_axis is not None and mesh.shape["spatial"] > 1:
        spec[spatial_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device_put a pytree of host arrays with batch sharding on leaves
    whose leading dim is the batch."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)
