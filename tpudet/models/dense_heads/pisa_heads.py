"""PISA heads (reference mmdet/models/dense_heads/pisa_retinanet_head.py,
pisa_ssd_head.py, losses/pisa_loss.py).

Prime Sample Attention:
- ISR-P (isr_p, pisa_loss.py:8-117): positive classification weights are
  remapped by IoU-Hierarchical-Local-Rank — rank positives within their gt
  by IoU, then within their class across the batch — as
  ``(bias + w*(1-bias))^k`` with the sum renormalized to keep the
  positive cls loss magnitude;
- CARL (carl_loss, pisa_loss.py:120-184): the regression loss of each
  positive is scaled by its (normalized) classification score so cls and
  reg optimize jointly.

Shape-static: ranks come from pairwise comparisons over a capped positive
set (top ``max_pos`` positives per batch), O(K^2) instead of grouped sorts.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.assigners import NEGATIVE, max_iou_assign_batch
from ...core.bbox import bbox_overlaps_aligned
from ...registry import DETECTORS, HEADS
from .. import losses as L
from ..detectors.single_stage import SingleStageDetector
from .retina_head import RetinaHead
from .ssd_head import SSDHead

EPS = 1e-12


def isr_weights_masks(ious, same_gt, same_label, pos, k=2.0, bias=0.0):
    """Dense IoU-HLR importance weights from pairwise grouping masks.

    ious/pos: (K,); same_gt/same_label: (K, K) pairwise masks already
    restricted to positive pairs. Returns (K,) weights (1 where not
    positive)."""
    # max count of positives sharing a label (bincount().max())
    label_cnt = jnp.sum(same_label, axis=1)
    max_l_num = jnp.maximum(jnp.max(jnp.where(pos, label_cnt, 0)), 1)

    rank_gt = jnp.sum(same_gt & (ious[None, :] > ious[:, None]), axis=1)
    iou2 = ious + (max_l_num - rank_gt)
    rank_l = jnp.sum(same_label & (iou2[None, :] > iou2[:, None]), axis=1)
    w = (max_l_num - rank_l).astype(jnp.float32) / max_l_num
    imp = (bias + w * (1 - bias))**k
    return jnp.where(pos, imp, 1.0)


def isr_p_weights(ious, labels, gt_ids, pos, k=2.0, bias=0.0):
    """IoU-HLR weights for a capped positive set keyed by integer gt ids.

    Args: all (K,) — decoded-pred IoU with the target, class label, a
    batch-unique gt id, positive mask. Returns (K,) weights (1 where not
    positive)."""
    same_gt = (gt_ids[:, None] == gt_ids[None, :]) & \
        (labels[:, None] == labels[None, :]) & pos[:, None] & pos[None, :]
    same_label = (labels[:, None] == labels[None, :]) & pos[:, None] & \
        pos[None, :]
    return isr_weights_masks(ious, same_gt, same_label, pos, k, bias)


def carl_weights(pos_cls_score, pos, k=1.0, bias=0.2):
    """(K,) classification-aware regression weights, sum == num_pos."""
    w = (bias + (1 - bias) * pos_cls_score)**k
    w = jnp.where(pos, w, 0.)
    num_pos = jnp.sum(pos.astype(jnp.float32))
    return w * num_pos / jnp.maximum(jnp.sum(w), EPS)


@HEADS.register_module()
class PISARetinaHead(RetinaHead):
    """RetinaHead + ISR-P reweighted focal cls + CARL (weight 0.1)."""
    isr_k: float = 2.0
    isr_bias: float = 0.0
    carl_k: float = 1.0
    carl_bias: float = 0.2
    carl_weight: float = 1.0  # reference carl_loss has no extra weight

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        cls_scores, bbox_preds = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        anchors = jnp.asarray(self._flat_anchors(featmap_sizes))
        b = cls_scores[0].shape[0]
        C = self.num_classes

        cls_flat = jnp.concatenate([
            c.reshape(b, -1, C).astype(jnp.float32) for c in cls_scores
        ], axis=1)
        reg_flat = jnp.concatenate([
            r.reshape(b, -1, 4).astype(jnp.float32) for r in bbox_preds
        ], axis=1)

        assigned = max_iou_assign_batch(
            anchors, gt_bboxes, gt_valid, self.pos_iou_thr,
            self.neg_iou_thr, self.min_pos_iou, True)
        pos = assigned >= 0
        neg = assigned == NEGATIVE
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        gt_idx = jnp.clip(assigned, 0, None)
        labels = jnp.take_along_axis(gt_labels, gt_idx, axis=1)
        matched = jnp.take_along_axis(gt_bboxes, gt_idx[..., None], axis=1)
        matched = jnp.where(pos[..., None], matched,
                            jnp.broadcast_to(anchors[None], matched.shape))
        targets = self.bbox_coder.encode(anchors[None], matched)

        # ---- ISR-P on flattened batch positives
        G = gt_bboxes.shape[1]
        gt_uid = gt_idx + jnp.arange(b, dtype=jnp.int32)[:, None] * G
        decoded = self.bbox_coder.decode(
            jnp.broadcast_to(anchors[None], matched.shape),
            jax.lax.stop_gradient(reg_flat))
        ious = bbox_overlaps_aligned(decoded, matched)  # (B, A)
        # cap the pairwise-rank set at the highest-IoU positives
        pos_flat = pos.reshape(-1)
        iou_flat = ious.reshape(-1)
        kcap = min(256, pos_flat.shape[0])
        order = jnp.argsort(jnp.where(pos_flat, -iou_flat, 2.0),
                            stable=True)[:kcap]
        imp_k = isr_p_weights(
            ious.reshape(-1)[order], labels.reshape(-1)[order],
            gt_uid.reshape(-1)[order], pos_flat[order], self.isr_k,
            self.isr_bias)
        imp = jnp.ones(pos_flat.shape[0], jnp.float32).at[order].set(
            imp_k).reshape(b, -1)
        # renormalize so pos focal loss magnitude is preserved
        onehot = jax.nn.one_hot(labels, C) * pos[..., None]
        el = L.sigmoid_focal_loss(cls_flat, onehot, gamma=self.focal_gamma,
                                  alpha=self.focal_alpha, reduction='none')
        pos_l = jnp.sum(el, -1) * pos
        ratio = jnp.sum(pos_l) / jnp.maximum(jnp.sum(pos_l * imp), EPS)
        imp = jnp.where(pos, imp * ratio, 1.0)
        cls_w = jnp.where(pos | neg, imp, 0.)
        loss_cls = jnp.sum(el * cls_w[..., None]) / num_pos

        # ---- regression + CARL
        loss_bbox = L.l1_loss(reg_flat, targets,
                              weight=pos[..., None].astype(jnp.float32),
                              avg_factor=num_pos)
        p_cls = jax.nn.sigmoid(jnp.take_along_axis(
            cls_flat, jnp.clip(labels, 0, C - 1)[..., None], -1))[..., 0]
        cw = carl_weights(p_cls.reshape(-1), pos.reshape(-1), self.carl_k,
                          self.carl_bias).reshape(b, -1)
        reg_el = jnp.sum(jnp.abs(reg_flat - targets), -1)
        loss_carl = self.carl_weight * jnp.sum(
            reg_el * cw * pos) / num_pos
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_carl=loss_carl,
                    num_gts=jnp.mean(jnp.sum(gt_valid.astype(jnp.float32),
                                             axis=1)))


@DETECTORS.register_module()
class PISARetinaNet(SingleStageDetector):
    """configs/pisa/pisa_retinanet_*."""

    def get_bboxes(self, pred_maps, **kwargs):
        cfg = dict(self.test_cfg or {})
        nms_cfg = cfg.pop('nms', None)
        if nms_cfg is not None:
            cfg['iou_thr'] = nms_cfg.get('iou_threshold', 0.5)
        cfg.pop('min_bbox_size', None)
        cfg.update(kwargs)
        return self.bbox_head.get_bboxes(pred_maps, **cfg)


@HEADS.register_module()
class PISASSDHead(SSDHead):
    """SSDHead + ISR-P weighted CE + CARL (pisa_ssd_head.py)."""
    isr_k: float = 2.0
    isr_bias: float = 0.0
    carl_k: float = 1.0
    carl_bias: float = 0.2
    carl_weight: float = 1.0  # reference carl_loss has no extra weight

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        import numpy as np
        cls_scores, bbox_preds = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        anchors = jnp.asarray(np.concatenate(
            self.anchor_generator.grid_anchors(featmap_sizes)))
        b = cls_scores[0].shape[0]
        cls_flat = jnp.concatenate([
            c.reshape(b, -1, self.cls_out_channels).astype(
                jnp.float32) for c in cls_scores], axis=1)
        reg_flat = jnp.concatenate([
            r.reshape(b, -1, 4).astype(jnp.float32)
            for r in bbox_preds], axis=1)
        assigned = max_iou_assign_batch(
            anchors, gt_bboxes, gt_valid, self.pos_iou_thr,
            self.neg_iou_thr, 0.0, True)
        pos = assigned >= 0
        neg = assigned == -1
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        gt_idx = jnp.clip(assigned, 0, None)
        labels = jnp.where(
            pos, jnp.take_along_axis(gt_labels, gt_idx, axis=1),
            self.num_classes)
        ce = -jnp.take_along_axis(
            jax.nn.log_softmax(cls_flat, -1), labels[..., None],
            axis=-1)[..., 0]
        neg_ce = jnp.where(neg, ce, -1.0)
        rank = jnp.argsort(jnp.argsort(-neg_ce, axis=1), axis=1)
        k_i = 3 * jnp.sum(pos, axis=1)
        neg_keep = neg & (rank < k_i[:, None])

        matched = jnp.take_along_axis(gt_bboxes, gt_idx[..., None],
                                      axis=1)
        matched = jnp.where(
            pos[..., None], matched,
            jnp.broadcast_to(anchors[None], matched.shape))
        targets = self.bbox_coder.encode(anchors[None], matched)

        # ISR-P over capped positives
        G = gt_bboxes.shape[1]
        gt_uid = gt_idx + jnp.arange(b, dtype=jnp.int32)[:, None] * G
        decoded = self.bbox_coder.decode(
            jnp.broadcast_to(anchors[None], matched.shape),
            jax.lax.stop_gradient(reg_flat))
        ious = bbox_overlaps_aligned(decoded, matched)
        # cap the pairwise-rank set at the highest-IoU positives
        pos_flat = pos.reshape(-1)
        iou_flat = ious.reshape(-1)
        kcap = min(256, pos_flat.shape[0])
        order = jnp.argsort(jnp.where(pos_flat, -iou_flat, 2.0),
                            stable=True)[:kcap]
        imp_k = isr_p_weights(
            ious.reshape(-1)[order], labels.reshape(-1)[order],
            gt_uid.reshape(-1)[order], pos_flat[order], self.isr_k,
            self.isr_bias)
        imp = jnp.ones(pos_flat.shape[0], jnp.float32).at[
            order].set(imp_k).reshape(b, -1)
        ratio = jnp.sum(ce * pos) / jnp.maximum(
            jnp.sum(ce * pos * imp), EPS)
        imp = jnp.where(pos, imp * ratio, 1.0)
        loss_cls = jnp.sum(
            ce * jnp.where(pos | neg_keep, imp, 0.)) / num_pos

        loss_bbox = L.smooth_l1_loss(
            reg_flat, targets, beta=self.smoothl1_beta,
            weight=pos[..., None].astype(jnp.float32),
            avg_factor=num_pos)
        p_cls = jax.nn.softmax(cls_flat, -1)
        p_cls = jnp.take_along_axis(
            p_cls, jnp.clip(labels, 0, self.num_classes)[..., None],
            -1)[..., 0]
        cw = carl_weights(p_cls.reshape(-1), pos_flat, self.carl_k,
                          self.carl_bias).reshape(b, -1)
        reg_el = jnp.sum(jnp.abs(reg_flat - targets), -1)
        loss_carl = self.carl_weight * jnp.sum(
            reg_el * cw * pos) / num_pos
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_carl=loss_carl,
                    num_gts=jnp.mean(jnp.sum(
                        gt_valid.astype(jnp.float32), axis=1)))
