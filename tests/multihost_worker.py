"""Multi-process (multi-host analogue) worker: one sharded train step +
orbax checkpoint round-trip over a mesh that SPANS processes.

Launched by tests/test_multihost.py (and `__graft_entry__.dryrun_multichip`
with processes > 1): each process provisions `--devices-per-process`
virtual CPU devices, joins the jax.distributed coordination service, and
the global mesh of num_processes x devices-per-process devices runs ONE
data+spatial-sharded train step with global-batch BN — the DCN-across-hosts
story (SURVEY §5 "standard JAX multi-host runtime"; cross-process
collectives ride gloo on CPU, ICI+DCN on real slices).

The deterministic global batch (np.random.RandomState(0), built identically
on every process, materialized per-process via jax.make_array_from_callback
so each process only holds its ADDRESSABLE shards) makes the loss directly
comparable to a single-process run of the same program — the parity the
parent test asserts.  Prints one JSON line with the loss and the
checkpoint-restore verdict.

Usage:
  python tests/multihost_worker.py --process-id I --num-processes N \
      --coordinator 127.0.0.1:PORT --devices-per-process 4 --out DIR \
      [--arch unet_small --height 64 --width 128]
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", default="127.0.0.1:29481")
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--out", required=True)
    ap.add_argument("--arch", default="unet_small")
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--spatial", type=int, default=2)
    args = ap.parse_args()

    # platform/device provisioning MUST precede first backend init; an
    # inherited device-count flag (e.g. from the parent pytest process)
    # would otherwise override ours
    inherited = [f for f in os.environ.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
    os.environ["XLA_FLAGS"] = " ".join(
        inherited + ["--xla_force_host_platform_device_count={}".format(
            args.devices_per_process)])
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax
    jax.config.update("jax_platforms", "cpu")
    if args.num_processes > 1:
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)

    import numpy as np
    import jax.numpy as jnp
    from mergenet_tpu.models import get_model
    from mergenet_tpu.parallel import (make_mesh, make_optimizer,
                                       create_train_state, build_train_step)
    from mergenet_tpu.parallel.mesh import batch_sharding
    from mergenet_tpu.utils.checkpoint import (save_checkpoint,
                                               load_checkpoint)

    n_global = args.num_processes * args.devices_per_process
    assert len(jax.devices()) == n_global, (len(jax.devices()), n_global)
    spatial = args.spatial if n_global % args.spatial == 0 else 1
    mesh = make_mesh(data=n_global // spatial, spatial=spatial)

    num_classes, num_offsets = 5, 4
    model = get_model(num_classes, num_offsets, args.arch)
    tx = make_optimizer(lr=0.01, milestones=[5])
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               (1, args.height, args.width, 3))
    step = build_train_step(num_classes, num_offsets, alpha=1.0, mesh=mesh,
                            donate=False)

    # identical global batch on every process; each process materializes
    # only the shards addressable to its local devices
    rng = np.random.RandomState(0)
    img_np = rng.rand(args.batch, args.height, args.width, 3
                      ).astype(np.float32)
    tgt_np = (rng.rand(args.batch, args.height, args.width,
                       num_classes + num_offsets) > 0.5).astype(np.float32)
    sh = batch_sharding(mesh)
    img = jax.make_array_from_callback(img_np.shape, sh,
                                       lambda idx: img_np[idx])
    tgt = jax.make_array_from_callback(tgt_np.shape, sh,
                                       lambda idx: tgt_np[idx])

    state, metrics = step(state, img, tgt, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])

    # orbax round trip across processes (all processes participate; the
    # checkpoint layer must coordinate the rmtree/copytree on process 0)
    save_checkpoint(args.out, state, is_best=False,
                    offsets=[(1, 0), (0, 1)], epoch=1, best_iou=0.5)
    fresh = create_train_state(model, tx, jax.random.PRNGKey(7),
                               (1, args.height, args.width, 3))
    restored, meta = load_checkpoint(args.out, fresh)
    leaves_a = jax.tree_util.tree_leaves(state.params)
    leaves_b = jax.tree_util.tree_leaves(restored.params)
    restore_ok = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_a, leaves_b))
    print(json.dumps({
        "process": args.process_id,
        "num_processes": args.num_processes,
        "n_global_devices": len(jax.devices()),
        "n_local_devices": len(jax.local_devices()),
        "mesh": dict(mesh.shape),
        "loss": loss,
        "restore_ok": bool(restore_ok),
        "meta_offsets": meta.get("offsets") == [(1, 0), (0, 1)],
    }), flush=True)


if __name__ == "__main__":
    main()
