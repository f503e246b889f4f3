"""Device-side training-target construction.

Given an instance-id mask and a per-instance class table, build the
`(H, W, num_classes + num_offsets)` float target the network regresses:
one-hot class planes plus, per offset o, a plane that is 1 where pixel p and
pixel p+o belong to the same instance.

TPU-first design: the whole construction is `jnp.roll` + compares, jittable
and batchable (`jax.vmap`), so targets are built on device from compact
(mask, class-table) inputs instead of shipping `(C+O, H, W)` bool tensors
from host dataloader workers.

Behavioral parity: reference `utils/dataset.py:107-129` (AllDataset) with
the sign-correct border handling of `utils/dataset.py:259-277`
(OffsetDataset) — the AllDataset variant's border masking is buggy for
positive offsets; we use the correct form everywhere.

Convention: out-of-bounds comparisons count as "same" (target 1), matching
the reference's border fill.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def instance_mask_to_class_mask(mask, object_class):
    """Map instance ids to class ids.

    Args:
        mask: (H, W) int array of instance ids (0 = background).
        object_class: (K,) int array; object_class[i] is the class of
            instance id i (index 0 = background class 0).
    Returns:
        (H, W) int array of class ids.
    """
    object_class = jnp.asarray(object_class)
    return object_class[mask]


def _border_same(H, W, di, dj):
    """Boolean (H, W) plane marking pixels whose +offset partner is out of
    bounds; by convention these are labeled 'same' (1)."""
    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]
    oob_r = (rows + di < 0) | (rows + di >= H)
    oob_c = (cols + dj < 0) | (cols + dj >= W)
    return oob_r | oob_c


@functools.partial(jax.jit, static_argnames=("num_classes", "offsets"))
def mask_to_target(mask, object_class, num_classes, offsets):
    """Build the (H, W, num_classes + num_offsets) float32 target.

    Args:
        mask: (H, W) int32 instance-id mask (0 = background).
        object_class: (K,) int32 instance-id -> class-id table (padded with
            zeros beyond the live instances; index 0 is background).
        num_classes: number of classes incl. background; pass 0 to build an
            offsets-only target.
        offsets: tuple of (di, dj) tuples (static).
    Returns:
        float32 (H, W, num_classes + len(offsets)) target in NHWC-style
        channel-last layout (TPU friendly).
    """
    H, W = mask.shape
    planes = []
    if num_classes > 0:
        class_mask = instance_mask_to_class_mask(mask, object_class)
        class_planes = jax.nn.one_hot(class_mask, num_classes, axis=-1)
        planes.append(class_planes)
    if offsets:
        ofs_planes = []
        for (di, dj) in offsets:
            rolled = jnp.roll(jnp.roll(mask, -di, axis=0), -dj, axis=1)
            same = (rolled == mask)
            same = same | _border_same(H, W, di, dj)
            ofs_planes.append(same)
        planes.append(jnp.stack(ofs_planes, axis=-1).astype(jnp.float32))
    return jnp.concatenate(planes, axis=-1) if len(planes) > 1 else planes[0]


def mask_to_target_batch(masks, object_classes, num_classes, offsets):
    """Batched mask_to_target over a leading batch axis."""
    return jax.vmap(
        lambda m, oc: mask_to_target(m, oc, num_classes, offsets)
    )(masks, object_classes)


def mask_to_target_np(mask, object_class, num_classes, offsets):
    """Pure-numpy twin for host dataloaders / tests."""
    H, W = mask.shape
    C, O = num_classes, len(offsets)
    target = np.zeros((H, W, C + O), dtype=np.float32)
    oc = np.asarray(object_class)
    class_mask = oc[mask]
    for c in range(C):
        target[:, :, c] = class_mask == c
    for n, (di, dj) in enumerate(offsets):
        rolled = np.roll(np.roll(mask, -di, axis=0), -dj, axis=1)
        plane = (rolled == mask).astype(np.float32)
        if di < 0:
            plane[:-di, :] = 1
        elif di > 0:
            plane[-di:, :] = 1
        if dj < 0:
            plane[:, :-dj] = 1
        elif dj > 0:
            plane[:, -dj:] = 1
        target[:, :, C + n] = plane
    return target
