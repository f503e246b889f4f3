"""Loss functions for the class + offset heads.

JAX re-designs of the reference losses (`utils/loss.py:24-87`), all pure
functions over channel-last `(..., H, W, C)` logits/targets so XLA fuses the
sigmoid/log terms into surrounding convolutions.  The combined
class + alpha * offset objective (`fused_class_offset_loss`) relies on that
XLA fusion — measured faster than a hand-written Pallas kernel at the
recipes' channel-minor layout (docs/benchmarks.md "Pallas fused loss").
"""

import jax
import jax.numpy as jnp


def _bce_from_logits(logits, targets, weight=None):
    """Numerically stable elementwise binary cross-entropy with logits:
    max(x,0) - x*t + log(1+exp(-|x|))."""
    neg_abs = -jnp.abs(logits)
    per_elem = jnp.maximum(logits, 0.0) - logits * targets + \
        jnp.log1p(jnp.exp(neg_abs))
    if weight is not None:
        per_elem = per_elem * weight
    return per_elem


def bce_with_logits_loss(logits, targets):
    """Mean binary cross-entropy with logits (the recipes' default loss,
    reference `egs/cityscape/local/train.py:183-204`)."""
    return jnp.mean(_bce_from_logits(logits, targets))


def weighted_bce_with_logits_loss(logits, targets, alpha=0.5):
    """BCE with constant positive/negative class weighting
    (reference `loss.py:79-87`)."""
    weight = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    return jnp.mean(_bce_from_logits(logits, targets, weight))


def multi_bce_with_logits_loss(logits, targets):
    """BCE re-weighted per (image, channel) by predicted positive mass:
    weight = (n - sum(sigmoid) + 1) / (sum(sigmoid) + 1) on positives
    (reference `loss.py:63-76`).

    Expects (..., H, W, C) channel-last layout.
    """
    h, w = targets.shape[-3], targets.shape[-2]
    n = h * w
    prob_mass = jnp.sum(jax.nn.sigmoid(logits), axis=(-3, -2),
                        keepdims=True)  # (..., 1, 1, C)
    pos_weight = (n - prob_mass + 1.0) / (prob_mass + 1.0)
    weight = pos_weight * targets + (1.0 - targets)
    return jnp.mean(_bce_from_logits(logits, targets, weight))


def soft_dice_loss(logits, targets, mode="1", smooth=1.0):
    """Soft dice over sigmoid probabilities, summed over channels.

    mode '0' complements both sides first, weighting the boundary
    ("different") class (reference `loss.py:38-58`).
    """
    probs = jax.nn.sigmoid(logits)
    if mode == "0":
        probs = 1.0 - probs
        targets = 1.0 - targets
    # flatten everything except the channel axis
    c = probs.shape[-1]
    p = probs.reshape(-1, c)
    t = targets.reshape(-1, c)
    intersection = jnp.sum(p * t, axis=0)
    denom = jnp.sum(p, axis=0) + jnp.sum(t, axis=0)
    dice = (2.0 * intersection + smooth) / (denom + smooth)
    return jnp.sum(1.0 - dice)


def cross_entropy_one_hot_loss(logits, targets):
    """Softmax cross-entropy against the argmax of a one-hot(ish) target
    (reference `loss.py:24-35`): target (..., H, W, C) -> labels, then CE.
    """
    labels = jnp.argmax(targets, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)
    return -jnp.mean(picked)


def fused_class_offset_loss(logits, targets, num_classes, alpha=1.0,
                            class_loss=bce_with_logits_loss,
                            offset_loss=bce_with_logits_loss):
    """Combined objective over a channel-stacked (..., H, W, C+O) tensor:
    loss = class_loss(logits[...,:C]) + alpha * offset_loss(logits[...,C:])
    (reference `train_utils.py:54-75`).

    Returns (total, (cls_loss, ofs_loss)).
    """
    cls = class_loss(logits[..., :num_classes], targets[..., :num_classes])
    ofs = offset_loss(logits[..., num_classes:], targets[..., num_classes:])
    return cls + alpha * ofs, (cls, ofs)


_LOSSES = {
    "bce": bce_with_logits_loss,
    "wbce": weighted_bce_with_logits_loss,
    "mbce": multi_bce_with_logits_loss,
    "dice": lambda lg, t: soft_dice_loss(lg, t, mode="0"),
    "ce": cross_entropy_one_hot_loss,
}


def get_loss_fn(name):
    """Loss registry keyed by the recipe flag names
    (reference `train.py:47-48,191-204`)."""
    if name not in _LOSSES:
        raise ValueError("Unknown loss '{}'; choose from {}".format(
            name, sorted(_LOSSES)))
    return _LOSSES[name]
