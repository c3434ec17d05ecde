"""Dynamic R-CNN (reference mmdet/models/roi_heads/dynamic_roi_head.py).

Training-time adaptation of (a) the assignment IoU threshold to the
``topk=75``-th highest proposal-gt IoU and (b) the smooth-L1 beta to the
``beta_topk=10``-th smallest positive regression error.

Shape-static rebuild note: the reference accumulates these statistics over
``update_iter_interval=100`` iterations in Python lists and updates the
assigner/loss in-place. A pure jitted step has no mutable hook state, so
the adaptation here uses the CURRENT batch's statistics each step (the
same quantities, EMA window of 1). The clamps (iou >= initial 0.4,
beta <= initial 1.0) match the reference's floors.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ...core.bbox import bbox_overlaps
from ...registry import DETECTORS, HEADS
from .. import losses as L
from ..detectors.two_stage import TwoStageDetector
from .standard_roi_head import StandardRoIHead


@HEADS.register_module()
class DynamicRoIHead(StandardRoIHead):
    initial_iou: float = 0.4
    iou_topk: int = 75
    initial_beta: float = 1.0
    beta_topk: int = 10

    def sample_rois(self, proposals, prop_valid, gt_bboxes, gt_labels,
                    gt_valid):
        """Dynamic label assignment: per image, the ``iou_topk``-th highest
        IoU per gt becomes this batch's threshold (dynamic_roi_head.py
        _update_hyperparameters)."""

        def one_thr(props, pv, gts, gv):
            ious = bbox_overlaps(props, gts)  # (P, G)
            ious = jnp.where(pv[:, None] & gv[None, :], ious, 0.)
            k = min(self.iou_topk, props.shape[0])
            topk, _ = jax.lax.top_k(ious.T, k)  # (G, k)
            per_gt = topk[:, -1]
            cnt = jnp.maximum(jnp.sum(gv.astype(jnp.float32)), 1.0)
            return jnp.sum(jnp.where(gv, per_gt, 0.)) / cnt

        thr = jnp.mean(jax.vmap(one_thr)(proposals, prop_valid, gt_bboxes,
                                         gt_valid))
        thr = jnp.maximum(thr, self.initial_iou)
        # StandardRoIHead.sample_rois with the traced threshold
        return StandardRoIHead.sample_rois(
            self, proposals, prop_valid, gt_bboxes, gt_labels, gt_valid,
            iou_thr=thr)

    def loss(self, cls_logits, deltas, labels, targets, pos,
             sampled, rois=None) -> Dict:
        out = StandardRoIHead.loss(self, cls_logits, deltas, labels,
                                   targets, pos, sampled)
        # dynamic smooth-l1: beta = beta_topk-th smallest positive |error|
        b, s_ = labels.shape
        if deltas.shape[-1] == 4:
            reg = deltas.astype(jnp.float32)
        else:
            reg = deltas.reshape(b, s_, self.num_classes, 4).astype(
                jnp.float32)
            cls_idx = jnp.clip(labels, 0, self.num_classes - 1)
            reg = jnp.take_along_axis(
                reg, cls_idx[..., None, None].repeat(4, -1), axis=2)[:, :, 0]
        # reference dynamic_roi_head: statistic = kthvalue(beta_topk * B)
        # of the mean |xy error| (xy dims only) among positives
        err = jnp.mean(jnp.abs(reg[..., :2] - targets[..., :2]), axis=-1)
        err = jnp.where(pos, err, jnp.inf)
        k = min(self.beta_topk * b, err.shape[1] * b)
        small, _ = jax.lax.top_k(-err.reshape(-1), k)
        beta = jnp.clip(-small[-1], 1e-3, self.initial_beta)
        beta = jax.lax.stop_gradient(beta)
        num_total = jnp.maximum(jnp.sum(sampled.astype(jnp.float32)), 1.0)
        diff = jnp.abs(reg - targets)
        sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                        diff - 0.5 * beta)
        out['loss_bbox'] = jnp.sum(
            sl1 * pos[..., None].astype(jnp.float32)) / num_total
        out['dynamic_beta'] = beta
        return out


@DETECTORS.register_module()
class DynamicRCNN(TwoStageDetector):
    """reference configs/dynamic_rcnn."""
