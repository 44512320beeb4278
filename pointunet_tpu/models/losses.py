"""Segmentation losses.

Point-segmentation losses mirror reference PointSegment/RandLANet.py:267-312;
volumetric losses mirror SaliencyAttention/model.py:432-618 (niftynet-derived).

TPU note: the reference masks invalid points by dynamically gathering valid
rows (tf.where + tf.gather, RandLANet.py:72-74) — a dynamic shape. Here the
same math is a masked mean over static shapes.

Deviation (documented per SURVEY §7): the reference's per-class weight-map
tiling in `dice` (model.py:527-529, tf.tile(weight_map,[C]) then reshape)
scrambles voxel weights across classes; we implement the obvious intent,
broadcasting the per-voxel weight over classes.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def _valid_mask_and_remap(
    labels: jax.Array, num_classes: int, ignored: Sequence[int]
):
    """Mask of non-ignored labels and ignored-collapsed label remap
    (reference RandLANet.py:62-84)."""
    valid = jnp.ones_like(labels, dtype=bool)
    for ign in ignored:
        valid = valid & (labels != ign)
    if ignored:
        total = num_classes + len(ignored)
        table = []
        nxt = 0
        for lab in range(total):
            if lab in ignored:
                table.append(0)
            else:
                table.append(nxt)
                nxt += 1
        labels = jnp.take(jnp.asarray(table, jnp.int32), labels)
    return valid, labels


def weighted_cross_entropy(
    logits: jax.Array,        # (..., C)
    labels: jax.Array,        # (...,) int
    class_weights: Sequence[float],
    num_classes: int,
    ignored: Sequence[int] = (),
) -> jax.Array:
    """Per-point class-weighted softmax CE, mean over valid points
    (reference get_loss, RandLANet.py:267-274)."""
    valid, labels = _valid_mask_and_remap(labels, num_classes, ignored)
    logits = logits.reshape(-1, num_classes)
    labels = labels.reshape(-1)
    valid = valid.reshape(-1)

    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    w = jnp.asarray(class_weights, logits.dtype)
    weights = jnp.sum(w * onehot, axis=-1)
    ce = -jnp.sum(onehot * jax.nn.log_softmax(logits, axis=-1), axis=-1)
    weighted = ce * weights * valid.astype(logits.dtype)
    return jnp.sum(weighted) / jnp.maximum(jnp.sum(valid), 1)


def point_dice_loss(
    logits: jax.Array, labels: jax.Array, num_classes: int
) -> jax.Array:
    """RandLA-Net dice variant over raw logits (reference RandLANet.py:276-293).

    Kept for parity; the training default is weighted CE.
    """
    onehot = jax.nn.one_hot(labels.reshape(-1), num_classes, dtype=jnp.float32)
    logits = logits.reshape(-1, num_classes)
    num = 2.0 * jnp.sum(onehot * logits, axis=0)
    den = jnp.sum(logits * logits, axis=0) + jnp.sum(onehot, axis=0)
    return 1.0 - jnp.mean(num / (den + 1e-5))


def soft_dice(
    probs: jax.Array,         # (V, C) softmax probabilities
    labels: jax.Array,        # (V,) int
    weight_map: Optional[jax.Array] = None,  # (V,)
) -> jax.Array:
    """V-Net soft dice with squared denominator (reference model.py:491-548)."""
    num_classes = probs.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=probs.dtype)
    if weight_map is not None:
        w = weight_map.reshape(-1, 1).astype(probs.dtype)
    else:
        w = jnp.ones((probs.shape[0], 1), probs.dtype)
    num = 2.0 * jnp.sum(w * onehot * probs, axis=0)
    den = jnp.sum(w * probs * probs, axis=0) + jnp.sum(onehot * w, axis=0)
    return 1.0 - jnp.mean(num / (den + 1e-5))


def generalised_dice_loss(
    probs: jax.Array, labels: jax.Array, weight_map: Optional[jax.Array] = None
) -> jax.Array:
    """Generalised (Sudre) dice: per-class weight 1/|ref|^2
    (reference model.py:432-488)."""
    num_classes = probs.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=probs.dtype)
    if weight_map is not None:
        w = weight_map.reshape(-1, 1).astype(probs.dtype)
        onehot = onehot * w
        probs = probs * w
    ref_vol = jnp.sum(onehot, axis=0)
    seg_vol = jnp.sum(probs, axis=0)
    intersect = jnp.sum(onehot * probs, axis=0)
    weights = jnp.where(ref_vol > 0, 1.0 / (ref_vol * ref_vol), 0.0)
    weights = jnp.where(
        ref_vol > 0, weights, jnp.max(weights)
    )
    num = 2.0 * jnp.sum(weights * intersect)
    den = jnp.sum(weights * (seg_vol + ref_vol)) + 1e-6
    return 1.0 - num / den


def saliency_dice_loss(
    logits: jax.Array,        # (B, D, H, W, C)
    weight: jax.Array,        # (B, D, H, W) or (B, D, H, W, 1)
    labels: jax.Array,        # (B, D, H, W) int
) -> jax.Array:
    """Batch-wise mean of per-sample weighted soft dice over softmax probs
    (reference Loss, model.py:592-618)."""
    b = logits.shape[0]
    c = logits.shape[-1]
    probs = jax.nn.softmax(logits.reshape(b, -1, c), axis=-1)
    labels = labels.reshape(b, -1)
    weight = weight.reshape(b, -1)
    per_sample = jax.vmap(soft_dice)(probs, labels, weight)
    return jnp.mean(per_sample)


def point_dice_weighted(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: Sequence[float] = (4.0, 1.0, 1.0, 1.0),
) -> jax.Array:
    """Class-weighted dice over raw logits with the reference's hardcoded
    [4,1,1,1] weights (reference get_loss_dice_weight, RandLANet.py:296-312)."""
    num_classes = len(class_weights)
    onehot = jax.nn.one_hot(labels.reshape(-1), num_classes, dtype=jnp.float32)
    logits = logits.reshape(-1, num_classes)
    w = jnp.asarray(class_weights, jnp.float32)[None, :]
    num = 2.0 * jnp.sum(w * onehot * logits, axis=0)
    den = jnp.sum(w * logits * logits, axis=0) + jnp.sum(onehot, axis=0)
    return 1.0 - jnp.mean(num / (den + 1e-5))


def soft_dice_mixup(
    probs: jax.Array,         # (V, C) softmax probabilities
    target: jax.Array,        # (V, C) soft (mixed) one-hot target
    weight_map: Optional[jax.Array] = None,
) -> jax.Array:
    """V-Net dice against a soft target (reference dice_mixup,
    model.py:550-590)."""
    if weight_map is not None:
        w = weight_map.reshape(-1, 1).astype(probs.dtype)
    else:
        w = jnp.ones((probs.shape[0], 1), probs.dtype)
    num = 2.0 * jnp.sum(w * target * probs, axis=0)
    den = jnp.sum(w * probs * probs, axis=0) + jnp.sum(target * w, axis=0)
    return 1.0 - jnp.mean(num / (den + 1e-5))


def saliency_dice_loss_mixup(
    logits: jax.Array,        # (B, D, H, W, C)
    weight: jax.Array,        # (B, D, H, W)
    target: jax.Array,        # (B, D, H, W, C) mixed one-hot
) -> jax.Array:
    """Batch-wise mixup dice (reference Loss with MIXUP, model.py:592-618)."""
    b, c = logits.shape[0], logits.shape[-1]
    probs = jax.nn.softmax(logits.reshape(b, -1, c), axis=-1)
    target = target.reshape(b, -1, c)
    weight = weight.reshape(b, -1)
    return jnp.mean(jax.vmap(soft_dice_mixup)(probs, target, weight))
