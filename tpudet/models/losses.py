"""Loss functions — pure jnp, mask-aware.

Functional rebuild of the reference loss zoo
(mmdet/models/losses/cross_entropy_loss.py sigmoid path,
iou_loss.py:87 giou_loss, focal_loss.py py-version,
yolocsp_head.py:21-50 SoftFocalLoss, utils.py weight/reduce helpers).

Reference losses reduce over dynamically-shaped positive sets; here every
loss takes an optional ``weight``/``mask`` and a ``avg_factor`` so padded
slots contribute zero and means match the reference's dynamic-shape means
exactly.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.bbox import bbox_overlaps_aligned


def reduce_loss(loss, reduction: str = 'mean', weight=None,
                avg_factor: Optional[jnp.ndarray] = None):
    """weight -> reduce, mirroring reference utils.py:28-54.

    With ``weight`` given and reduction='mean', divides by ``avg_factor``
    (or the weight sum) instead of the element count — the semantics the
    reference uses for masked positives.
    """
    if weight is not None:
        loss = loss * weight
    if reduction == 'none':
        return loss
    if reduction == 'sum':
        return jnp.sum(loss)
    if reduction == 'mean':
        if avg_factor is None:
            if weight is None:
                return jnp.mean(loss)
            avg_factor = jnp.sum(weight)
        return jnp.sum(loss) / jnp.maximum(avg_factor, 1e-12)
    raise ValueError(f'unknown reduction {reduction}')


def binary_cross_entropy_with_logits(pred, target):
    """Elementwise BCE-with-logits (stable log-sum-exp form)."""
    return jnp.maximum(pred, 0) - pred * target + jnp.log1p(
        jnp.exp(-jnp.abs(pred)))


def bce_loss(pred, target, weight=None, reduction='mean', avg_factor=None,
             loss_weight=1.0):
    """Sigmoid CrossEntropyLoss (reference cross_entropy_loss.py,
    use_sigmoid=True): elementwise BCE, mean over all elements."""
    loss = binary_cross_entropy_with_logits(pred, target)
    return loss_weight * reduce_loss(loss, reduction, weight, avg_factor)


def giou_loss(pred, target, weight=None, reduction='mean', avg_factor=None,
              loss_weight=1.0, eps=1e-7):
    """1 - GIoU (reference iou_loss.py:87-103)."""
    loss = 1.0 - bbox_overlaps_aligned(pred, target, mode='giou', eps=eps)
    return loss_weight * reduce_loss(loss, reduction, weight, avg_factor)


def iou_loss(pred, target, weight=None, reduction='mean', avg_factor=None,
             loss_weight=1.0, eps=1e-6):
    """-log(IoU) (reference iou_loss.py:15-43)."""
    ious = jnp.clip(
        bbox_overlaps_aligned(pred, target, mode='iou', eps=eps), eps, None)
    loss = -jnp.log(ious)
    return loss_weight * reduce_loss(loss, reduction, weight, avg_factor)


def smooth_l1_loss(pred, target, beta=1.0, weight=None, reduction='mean',
                   avg_factor=None, loss_weight=1.0):
    """Reference smooth_l1_loss.py."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return loss_weight * reduce_loss(loss, reduction, weight, avg_factor)


def l1_loss(pred, target, weight=None, reduction='mean', avg_factor=None,
            loss_weight=1.0):
    loss = jnp.abs(pred - target)
    return loss_weight * reduce_loss(loss, reduction, weight, avg_factor)


def sigmoid_focal_loss(pred, target, gamma=2.0, alpha=0.25, weight=None,
                       reduction='mean', avg_factor=None, loss_weight=1.0):
    """Focal loss, python semantics of reference focal_loss.py:12-50
    (mmcv CUDA kernel parity): ``target`` is one-hot (no bg column)."""
    pred_sigmoid = jax.nn.sigmoid(pred)
    pt = (1 - pred_sigmoid) * target + pred_sigmoid * (1 - target)
    focal_weight = (alpha * target + (1 - alpha) * (1 - target)) * pt**gamma
    loss = binary_cross_entropy_with_logits(pred, target) * focal_weight
    return loss_weight * reduce_loss(loss, reduction, weight, avg_factor)


def soft_focal_loss(pred, target, gamma=1.5, alpha=0.25, weight=None,
                    reduction='mean', avg_factor=None, loss_weight=1.0):
    """TF-style focal modulation over BCE with *soft* targets
    (reference yolocsp_head.py:21-50 SoftFocalLoss)."""
    loss = binary_cross_entropy_with_logits(pred, target)
    pred_prob = jax.nn.sigmoid(pred)
    p_t = target * pred_prob + (1 - target) * (1 - pred_prob)
    alpha_factor = target * alpha + (1 - target) * (1 - alpha)
    loss = loss * alpha_factor * (1.0 - p_t)**gamma
    return loss_weight * reduce_loss(loss, reduction, weight, avg_factor)
