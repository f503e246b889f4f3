"""Shim: reference `models/modules/` (SynchronizedBatchNorm + DataParallel
machinery, ~540 LoC of thread rendezvous) -> SPMD no-ops.

Under pjit/GSPMD, batch-norm statistics are computed over the global
logical batch and gradients are all-reduced by XLA collectives, so the
reference's entire replication/rendezvous stack reduces to identity
functions.  These shims keep reference-style code importable:

    from models.modules import DataParallelWithCallback   # -> identity
    from models.modules import SynchronizedBatchNorm2d    # -> SyncBatchNorm
"""

from mergenet_tpu.models.layers import SyncBatchNorm

SynchronizedBatchNorm1d = SyncBatchNorm
SynchronizedBatchNorm2d = SyncBatchNorm
SynchronizedBatchNorm3d = SyncBatchNorm


def DataParallelWithCallback(model, device_ids=None):
    """Identity: data parallelism is expressed by the pjit mesh
    (`mergenet_tpu.parallel.build_train_step(mesh=...)`), not by wrapping
    the model."""
    return model


def patch_replication_callback(data_parallel):
    """No-op: there is no replication to patch under SPMD."""
    return data_parallel
