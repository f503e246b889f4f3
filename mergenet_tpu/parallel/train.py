"""Training state and jitted train/eval steps.

The TPU-native training loop core (replaces the reference's per-batch
`.cuda()` + backward + optimizer.step in `utils/train_utils.py:42-79`):

  * `TrainState` — params, batch_stats, optimizer state, step counter.
  * `make_optimizer` — optax SGD with nesterov momentum + weight decay and
    the reference's MultiStepLR(gamma=0.2) schedule
    (`egs/cityscape/local/train.py:175-212`).
  * `build_train_step(...)` — one jitted SPMD step: forward, fused
    class+offset loss, grad, update.  When `mesh` is given the step is
    sharded: batch over the 'data'/'spatial' axes, params replicated — XLA
    inserts the gradient all-reduce and batch-norm statistics are global
    (SyncBN semantics for free).
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..ops.losses import bce_with_logits_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, batch_stats):
        updates, opt_state = self.tx.update(grads, self.opt_state,
                                            self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=params,
                            batch_stats=batch_stats, opt_state=opt_state)


def multistep_lr(base_lr, milestones, gamma=0.2, steps_per_epoch=1):
    """MultiStepLR: lr *= gamma at each milestone epoch."""
    if not milestones:
        return base_lr
    boundaries = {int(m) * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(lr=0.01, momentum=0.9, nesterov=True, weight_decay=1e-4,
                   milestones=None, gamma=0.2, steps_per_epoch=1):
    """SGD + nesterov momentum + (coupled) weight decay + MultiStepLR.

    Matches torch.optim.SGD(weight_decay=...) semantics: the decay term is
    added to the gradient *before* the momentum update."""
    schedule = multistep_lr(lr, milestones, gamma, steps_per_epoch)
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=schedule, momentum=momentum,
                  nesterov=nesterov),
    )


def create_train_state(model, tx, rng, input_shape=(1, 64, 64, 3)):
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros(input_shape, jnp.float32), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=batch_stats, opt_state=tx.init(params), tx=tx,
        apply_fn=model.apply)


def _split_loss(logits, targets, num_classes, num_offsets, alpha,
                criterion_cls, criterion_ofs):
    """Channel-split class/offset objective (reference
    train_utils.py:45-75).  Either criterion may be None (class-only /
    offset-only training modes)."""
    cls_loss = ofs_loss = jnp.zeros((), logits.dtype)
    if criterion_cls is not None and num_classes > 0:
        cls_loss = criterion_cls(logits[..., :num_classes],
                                 targets[..., :num_classes])
    if criterion_ofs is not None and num_offsets > 0:
        ofs_loss = criterion_ofs(logits[..., num_classes:],
                                 targets[..., num_classes:])
    total = cls_loss + alpha * ofs_loss
    return total, cls_loss, ofs_loss


def _grad_step(state, img, target, rng, num_classes, num_offsets, alpha,
               criterion_cls, criterion_ofs, remat, aux_weight):
    """Shared forward/loss/grad body of both train-step builders:
    value_and_grad of the (optionally aux-supervised) split objective,
    apply gradients + batch_stats, return (new_state, metrics)."""

    def forward(params, img):
        kwargs = {"with_aux": True} if aux_weight else {}
        return state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            img, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng}, **kwargs)

    if remat:
        forward = jax.checkpoint(forward)

    def loss_fn(params):
        outs, updates = forward(params, img)
        aux_l = jnp.zeros((), jnp.float32)
        if aux_weight:
            outs, aux = outs
            aux_l, _, _ = _split_loss(
                aux, target, num_classes, num_offsets, alpha,
                criterion_cls, criterion_ofs)
        total, cls_l, ofs_l = _split_loss(
            outs, target, num_classes, num_offsets, alpha,
            criterion_cls, criterion_ofs)
        total = total + aux_weight * aux_l
        return total, (cls_l, ofs_l, aux_l, updates)

    (total, (cls_l, ofs_l, aux_l, updates)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(
        grads, updates.get("batch_stats", state.batch_stats))
    metrics = {"loss": total, "cls_loss": cls_l, "ofs_loss": ofs_l}
    if aux_weight:
        metrics["aux_loss"] = aux_l
    return new_state, metrics


def build_train_step(num_classes, num_offsets, alpha=1.0,
                     criterion_cls=bce_with_logits_loss,
                     criterion_ofs=bce_with_logits_loss,
                     mesh=None, donate=True, remat=False, aux_weight=0.0):
    """Returns step(state, img, target, dropout_rng) -> (state, metrics).

    img: (N, H, W, 3) float; target: (N, H, W, C+O) float.
    With `mesh`, inputs are expected sharded batch-wise and the returned
    function is jitted over the mesh (params replicated).
    `remat=True` rematerializes the forward during backprop
    (jax.checkpoint) — trades FLOPs for activation memory, enabling
    bigger batches / crops per chip.
    `aux_weight > 0` enables deep supervision for models with an auxiliary
    head (PSPNet, reference `pspnet_caffe.py:297-299`): the model is
    called with `with_aux=True` and the same split objective on the aux
    logits is added with this weight.
    """

    def step(state, img, target, rng):
        return _grad_step(state, img, target, rng, num_classes,
                          num_offsets, alpha, criterion_cls, criterion_ofs,
                          remat, aux_weight)

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(step, donate_argnums=donate_argnums)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from .mesh import batch_sharding
    repl = NamedSharding(mesh, P())
    data = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(None, data, data, repl),
        donate_argnums=donate_argnums)


def build_train_step_compact(num_classes, offsets, alpha=1.0,
                             criterion_cls=bce_with_logits_loss,
                             criterion_ofs=bce_with_logits_loss,
                             mesh=None, donate=True, remat=False,
                             aux_weight=0.0):
    """Train step over *compact* batches from the grain pipeline:
    step(state, image_u8, mask, object_class, rng) -> (state, metrics).

    image_u8: (N, H, W, 3) uint8; mask: (N, H, W) int32 instance ids;
    object_class: (N, K) int32 class table.  Normalization (/256, the
    reference's convention, dataset.py:131-134) and the (C + O)-plane
    target construction (`ops.targets.mask_to_target`) run on device inside
    the jitted step — the host ships ~20x less data than float32 targets.
    `aux_weight > 0` adds deep supervision on the model's auxiliary head
    (same semantics as `build_train_step`).
    """
    from ..ops.targets import mask_to_target

    offsets = tuple(tuple(o) for o in offsets)
    num_offsets = len(offsets)

    def step(state, image_u8, mask, object_class, rng):
        img = image_u8.astype(jnp.float32) / 256.0
        target = jax.vmap(
            lambda m, oc: mask_to_target(m, oc, num_classes, offsets)
        )(mask, object_class)
        return _grad_step(state, img, target, rng, num_classes,
                          num_offsets, alpha, criterion_cls, criterion_ofs,
                          remat, aux_weight)

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(step, donate_argnums=donate_argnums)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from .mesh import batch_sharding
    repl = NamedSharding(mesh, P())
    data4 = batch_sharding(mesh)
    data_nhw = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(None, data4, data_nhw, data_nhw, repl),
        donate_argnums=donate_argnums)


def build_eval_step(num_classes, num_offsets, alpha=1.0,
                    criterion_cls=bce_with_logits_loss,
                    criterion_ofs=bce_with_logits_loss, mesh=None):
    """Returns eval(state, img, target) -> (sigmoid_probs, metrics).

    metrics carries batch-mean scalars plus per-sample (B,) vectors
    (`per_sample_*`, the criterion vmapped over rows) so callers that pad
    partial batches (utils.train_utils.validate pad_to) can aggregate
    the loss over real rows only."""

    def step(state, img, target):
        outs = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            img, train=False)
        total, cls_l, ofs_l = _split_loss(
            outs, target, num_classes, num_offsets, alpha,
            criterion_cls, criterion_ofs)
        per_tot, per_cls, per_ofs = jax.vmap(
            lambda lg, tg: _split_loss(lg, tg, num_classes, num_offsets,
                                       alpha, criterion_cls, criterion_ofs)
        )(outs, target)
        probs = jax.nn.sigmoid(outs)
        return probs, {"loss": total, "cls_loss": cls_l, "ofs_loss": ofs_l,
                       "per_sample_loss": per_tot,
                       "per_sample_cls": per_cls,
                       "per_sample_ofs": per_ofs}

    if mesh is None:
        return jax.jit(step)
    from .mesh import batch_sharding
    data = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(None, data, data))
