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
             loss_weight=1.0, eps=1e-6, linear=False):
    """-log(IoU), or 1 - IoU when ``linear`` (reference iou_loss.py:15-43)."""
    ious = jnp.clip(
        bbox_overlaps_aligned(pred, target, mode='iou', eps=eps), eps, None)
    loss = (1 - ious) if linear else -jnp.log(ious)
    return loss_weight * reduce_loss(loss, reduction, weight, avg_factor)


def bounded_iou_loss(pred, target, beta=0.2, weight=None, reduction='mean',
                     avg_factor=None, loss_weight=1.0, eps=1e-3):
    """Bounded IoU loss (reference iou_loss.py:41-82, Fitness-NMS paper):
    per-coordinate bounded IoU terms through a smooth-L1 envelope. The
    target branch is constant (no_grad in the reference). Returns a
    (..., 4) per-coordinate loss before reduction."""
    pcx = (pred[..., 0] + pred[..., 2]) * 0.5
    pcy = (pred[..., 1] + pred[..., 3]) * 0.5
    pw = pred[..., 2] - pred[..., 0]
    ph = pred[..., 3] - pred[..., 1]
    t = jax.lax.stop_gradient(target)
    tcx = (t[..., 0] + t[..., 2]) * 0.5
    tcy = (t[..., 1] + t[..., 3]) * 0.5
    tw = t[..., 2] - t[..., 0]
    th = t[..., 3] - t[..., 1]
    dx = jnp.abs(tcx - pcx)
    dy = jnp.abs(tcy - pcy)
    loss_dx = 1 - jnp.maximum((tw - 2 * dx) / (tw + 2 * dx + eps), 0.)
    loss_dy = 1 - jnp.maximum((th - 2 * dy) / (th + 2 * dy + eps), 0.)
    loss_dw = 1 - jnp.minimum(tw / (pw + eps), pw / (tw + eps))
    loss_dh = 1 - jnp.minimum(th / (ph + eps), ph / (th + eps))
    comb = jnp.stack([loss_dx, loss_dy, loss_dw, loss_dh], axis=-1)
    loss = jnp.where(comb < beta, 0.5 * comb * comb / beta,
                     comb - 0.5 * beta)
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


def mse_loss(pred, target, weight=None, reduction='mean', avg_factor=None,
             loss_weight=1.0):
    """Reference mse_loss.py."""
    loss = (pred - target)**2
    return loss_weight * reduce_loss(loss, reduction, weight, avg_factor)


def balanced_l1_loss(pred, target, beta=1.0, alpha=0.5, gamma=1.5,
                     weight=None, reduction='mean', avg_factor=None,
                     loss_weight=1.0):
    """Libra R-CNN balanced L1 (reference balanced_l1_loss.py)."""
    diff = jnp.abs(pred - target)
    b = jnp.e**(gamma / alpha) - 1
    loss = jnp.where(
        diff < beta,
        alpha / b * (b * diff + 1) * jnp.log(b * diff / beta + 1) -
        alpha * diff,
        gamma * diff + gamma / b - alpha * beta)
    return loss_weight * reduce_loss(loss, reduction, weight, avg_factor)


def varifocal_loss(pred, target, alpha=0.75, gamma=2.0, iou_weighted=True,
                   weight=None, reduction='mean', avg_factor=None,
                   loss_weight=1.0):
    """VarifocalNet loss (reference varifocal_loss.py): IoU-aware soft
    targets weight positives; negatives get focal down-weighting."""
    pred_sigmoid = jax.nn.sigmoid(pred)
    pos = (target > 0).astype(pred.dtype)
    if iou_weighted:
        focal_weight = target * pos + \
            alpha * jnp.abs(pred_sigmoid - target)**gamma * (1 - pos)
    else:
        focal_weight = pos + \
            alpha * jnp.abs(pred_sigmoid - target)**gamma * (1 - pos)
    loss = binary_cross_entropy_with_logits(pred, target) * focal_weight
    return loss_weight * reduce_loss(loss, reduction, weight, avg_factor)


def quality_focal_loss(pred, target_label, target_score, beta=2.0,
                       weight=None, reduction='mean', avg_factor=None,
                       loss_weight=1.0):
    """Generalized Focal Loss QFL (reference gfocal_loss.py): bce to the
    quality score at the gt class, |sigma - y|^beta modulation.

    target_label: (N,) int, num_classes == background.
    target_score: (N,) quality (IoU) in [0, 1].
    """
    num_classes = pred.shape[-1]
    sigma = jax.nn.sigmoid(pred)
    # background: target 0 everywhere
    onehot = (jax.nn.one_hot(target_label, num_classes) *
              target_score[..., None])
    modulating = jnp.abs(sigma - onehot)**beta
    loss = binary_cross_entropy_with_logits(pred, onehot) * modulating
    return loss_weight * reduce_loss(loss, reduction, weight, avg_factor)


def distribution_focal_loss(pred, target, weight=None, reduction='mean',
                            avg_factor=None, loss_weight=1.0):
    """GFL DFL (reference gfocal_loss.py): CE to the two integral bins
    around the continuous regression target."""
    disl = jnp.floor(target).astype(jnp.int32)
    disr = disl + 1
    wl = disr.astype(pred.dtype) - target
    wr = target - disl.astype(pred.dtype)
    logp = jax.nn.log_softmax(pred, axis=-1)
    n_bins = pred.shape[-1]
    ll = jnp.take_along_axis(
        logp, jnp.clip(disl, 0, n_bins - 1)[..., None], axis=-1)[..., 0]
    lr = jnp.take_along_axis(
        logp, jnp.clip(disr, 0, n_bins - 1)[..., None], axis=-1)[..., 0]
    loss = -(ll * wl + lr * wr)
    return loss_weight * reduce_loss(loss, reduction, weight, avg_factor)


def ghm_c_loss(pred, target, label_weight=None, bins=10, momentum=0.0,
               loss_weight=1.0):
    """Gradient-harmonized classification loss, stateless variant
    (reference ghm_loss.py GHMC without the EMA bin counts — momentum=0
    semantics): examples are inversely weighted by the density of their
    gradient magnitude |sigmoid(pred) - target|."""
    g = jax.lax.stop_gradient(jnp.abs(jax.nn.sigmoid(pred) - target))
    if label_weight is None:
        label_weight = jnp.ones_like(pred)
    valid = label_weight > 0
    tot = jnp.maximum(jnp.sum(valid), 1.0)
    edges = jnp.linspace(0, 1, bins + 1)
    weights = jnp.zeros_like(pred)
    nonempty = jnp.zeros((), jnp.float32)
    for i in range(bins):
        in_bin = (g >= edges[i]) & (g < edges[i + 1] + (1e-6 if i == bins - 1
                                                        else 0)) & valid
        num_in_bin = jnp.sum(in_bin)
        nonempty += (num_in_bin > 0).astype(jnp.float32)
        weights = jnp.where(in_bin & (num_in_bin > 0),
                            tot / jnp.maximum(num_in_bin, 1.0), weights)
    # normalize by the number of non-empty bins (ghm_loss.py:96-97)
    weights = weights / jnp.maximum(nonempty, 1.0)
    loss = binary_cross_entropy_with_logits(pred, target) * weights
    return loss_weight * jnp.sum(loss) / tot


def ghm_r_loss(pred, target, label_weight=None, mu=0.02, bins=10,
               loss_weight=1.0):
    """Gradient-harmonized regression loss, stateless variant (reference
    ghm_loss.py:95-170 GHMR with momentum=0 semantics): the Authentic
    Smooth L1 loss ``sqrt(d^2 + mu^2) - mu``, with each element inversely
    weighted by the histogram density of its gradient length
    ``|d| / sqrt(d^2 + mu^2)``.

    The reference walks the bins in a Python loop with ``.item()`` syncs;
    here the histogram is one one-hot matmul (g < 1 always, so the
    reference's 1e3 top edge reduces to clamping into the last bin) and
    the per-element weight is a (bins,)-table gather — no host syncs, no
    data-dependent control flow.
    """
    diff = pred - target
    asl1 = jnp.sqrt(diff * diff + mu * mu) - mu
    g = jax.lax.stop_gradient(
        jnp.abs(diff) / jnp.sqrt(diff * diff + mu * mu))
    if label_weight is None:
        label_weight = jnp.ones_like(pred)
    valid = label_weight > 0
    tot = jnp.maximum(jnp.sum(label_weight.astype(jnp.float32)), 1.0)
    bin_id = jnp.minimum((g * bins).astype(jnp.int32), bins - 1)
    counts = jnp.sum(
        jax.nn.one_hot(bin_id, bins, dtype=jnp.float32)
        * valid[..., None].astype(jnp.float32),
        axis=tuple(range(bin_id.ndim)))  # (bins,)
    nonempty = jnp.maximum(jnp.sum((counts > 0).astype(jnp.float32)), 1.0)
    w = jnp.where(valid, tot / jnp.maximum(jnp.take(counts, bin_id), 1.0),
                  0.0) / nonempty
    return loss_weight * jnp.sum(asl1 * w) / tot


def gaussian_focal_loss(pred, gaussian_target, alpha=2.0, gamma=4.0,
                        weight=None, reduction='mean', avg_factor=None,
                        loss_weight=1.0, eps=1e-12):
    """CornerNet/CenterNet heatmap focal loss (reference
    gaussian_focal_loss.py:10-29): ``pred`` is a sigmoid probability map,
    target a gaussian heatmap with 1 at keypoint centers."""
    pos_w = (gaussian_target == 1).astype(pred.dtype)
    neg_w = (1 - gaussian_target)**gamma
    pos = -jnp.log(pred + eps) * (1 - pred)**alpha * pos_w
    neg = -jnp.log(1 - pred + eps) * pred**alpha * neg_w
    return loss_weight * reduce_loss(pos + neg, reduction, weight,
                                     avg_factor)


def ae_loss(tl_emb, br_emb, valid, pull_weight=0.25, push_weight=0.25,
            margin=1.0):
    """Associative-embedding pull/push losses over padded corner embeddings
    (reference ae_loss.py:10-71), shape-static: ``tl_emb``/``br_emb`` are
    (G,) embeddings gathered at each padded gt's corner locations, ``valid``
    (G,) masks real objects.

    Returns (pull, push) already weighted."""
    n = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    mean = (tl_emb + br_emb) / 2.0
    pull = ((tl_emb - mean)**2 + (br_emb - mean)**2) * valid
    pull = jnp.sum(pull) / n

    diff = jnp.abs(mean[:, None] - mean[None, :])  # (G, G)
    pair = (valid[:, None] & valid[None, :]) & (
        ~jnp.eye(mean.shape[0], dtype=bool))
    push = jnp.maximum(margin - diff, 0.) * pair
    denom = jnp.maximum(n * (n - 1), 1.0)
    push = jnp.where(n > 1, jnp.sum(push) / denom, 0.0)
    return pull_weight * pull, push_weight * push


def kd_kl_div_loss(pred, soft_label, T=10.0, weight=None, reduction='mean',
                   avg_factor=None, loss_weight=1.0, detach_target=True):
    """KL-divergence knowledge-distillation loss (reference kd_loss.py:11):
    mean KL between T-softened teacher/student class distributions, x T^2."""
    target = jax.nn.softmax(soft_label / T, axis=-1)
    if detach_target:
        target = jax.lax.stop_gradient(target)
    logp = jax.nn.log_softmax(pred / T, axis=-1)
    kl = target * (jnp.log(jnp.clip(target, 1e-12, None)) - logp)
    loss = jnp.mean(kl, axis=-1) * (T * T)
    return loss_weight * reduce_loss(loss, reduction, weight, avg_factor)


def accuracy(pred, target, topk=1, thresh=None):
    """Top-k accuracy (reference accuracy.py:6); pred (N, C), target (N,)."""
    if pred.shape[0] == 0:
        return jnp.zeros(())
    k = min(topk, pred.shape[1])
    vals, inds = jax.lax.top_k(pred, k)
    correct = inds == target[:, None]
    if thresh is not None:
        correct = correct & (vals > thresh)
    return jnp.mean(jnp.any(correct, axis=1).astype(jnp.float32)) * 100.0
