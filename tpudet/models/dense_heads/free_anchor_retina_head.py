"""FreeAnchor RetinaNet head (reference
mmdet/models/dense_heads/free_anchor_retina_head.py:12).

Learning-to-match formulation, shape-static over padded gts:
- per gt, a bag of the ``pre_anchor_topk`` highest-IoU anchors; positive
  bag loss is ``-alpha * log(Mean-max(P_cls * P_loc))`` with
  ``P_loc = exp(-smooth_l1(pred, encode(anchor, gt)))`` (ref :178-196,
  :219-245).
- negative loss is a focal-modulated BCE on
  ``cls_prob * (1 - P{a in A+})`` where the anchor->object probability is
  a saturated-linear function of the *decoded-box* IoU (ref :113-167,
  :247-272), normalized by ``num_pos * topk``.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ...core.bbox import bbox_overlaps
from ...registry import HEADS
from .retina_head import RetinaHead

EPS = 1e-12


@HEADS.register_module()
class FreeAnchorRetinaHead(RetinaHead):
    pre_anchor_topk: int = 50
    bbox_thr: float = 0.6
    bag_gamma: float = 2.0
    bag_alpha: float = 0.5
    smooth_l1_beta: float = 0.11
    # reference config: loss_bbox loss_weight=0.75 folded into P_loc;
    # the recipe's coder stds (retinanet_free_anchor_r50_fpn_1x_coco.py:
    # 16-19) override RetinaHead's (1,1,1,1)
    target_stds: tuple = (0.1, 0.1, 0.2, 0.2)

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        cls_scores, bbox_preds = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        anchors = jnp.asarray(self._flat_anchors(featmap_sizes))  # (A, 4)
        b = cls_scores[0].shape[0]
        C = self.num_classes
        K = min(self.pre_anchor_topk, anchors.shape[0])

        cls_flat = jnp.concatenate([
            c.reshape(b, -1, C).astype(jnp.float32) for c in cls_scores
        ], axis=1)
        reg_flat = jnp.concatenate([
            r.reshape(b, -1, 4).astype(jnp.float32) for r in bbox_preds
        ], axis=1)
        cls_prob = jax.nn.sigmoid(cls_flat)  # (B, A, C)
        coder = self.bbox_coder

        def one_image(cls_p, reg_p, gts, labels, valid):
            # ---- anchor->object probability from decoded boxes (no grad)
            pred_boxes = jax.lax.stop_gradient(coder.decode(anchors, reg_p))
            iou = bbox_overlaps(gts, pred_boxes)  # (G, A)
            iou = jnp.where(valid[:, None], iou, 0.)
            t1 = self.bbox_thr
            t2 = jnp.clip(jnp.max(iou, axis=1, keepdims=True), t1 + EPS,
                          None)
            obj_box_prob = jnp.clip((iou - t1) / (t2 - t1), 0., 1.)
            obj_box_prob = jnp.where(valid[:, None], obj_box_prob, 0.)
            # image_box_prob (A, C): per anchor/class max over same-class gts
            onehot = jax.nn.one_hot(labels, C) * valid[:, None]  # (G, C)
            image_box_prob = jnp.max(
                obj_box_prob[:, :, None] * onehot[:, None, :], axis=0)
            image_box_prob = jax.lax.stop_gradient(image_box_prob)

            # ---- bags: topk anchors by gt-anchor IoU
            qual = bbox_overlaps(gts, anchors)  # (G, A)
            _, matched = jax.lax.top_k(qual, K)  # (G, K)
            m_cls = cls_p[matched]  # (G, K, C)
            m_cls_prob = jnp.take_along_axis(
                m_cls, labels[:, None, None].repeat(K, 1), axis=2)[..., 0]
            m_anchors = anchors[matched]  # (G, K, 4)
            # padded gts are zero-size: encode would log(0) -> inf/NaN
            # through the grad; give them the anchor itself (delta 0)
            gt_safe = jnp.where(valid[:, None, None],
                                jnp.broadcast_to(gts[:, None, :],
                                                 m_anchors.shape), m_anchors)
            m_targets = coder.encode(m_anchors, gt_safe)
            diff = jnp.abs(reg_p[matched] - m_targets)
            beta = self.smooth_l1_beta
            sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                            diff - 0.5 * beta).sum(-1) * 0.75  # loss_weight
            m_box_prob = jnp.exp(-sl1)  # (G, K)

            # positive bag loss: -alpha*log(Mean-max(...)) per valid gt
            m_prob = m_cls_prob * m_box_prob
            w = 1.0 / jnp.clip(1.0 - m_prob, EPS, None)
            w = w / jnp.sum(w, axis=1, keepdims=True)
            bag_prob = jnp.sum(w * m_prob, axis=1)
            pos_loss = -self.bag_alpha * jnp.log(jnp.clip(bag_prob, EPS,
                                                          1 - EPS))
            pos_loss = jnp.sum(jnp.where(valid, pos_loss, 0.))

            # negative loss over all (anchor, class)
            prob = jnp.clip(cls_p * (1 - image_box_prob), EPS, 1 - EPS)
            neg = (1 - self.bag_alpha) * prob**self.bag_gamma * (
                -jnp.log1p(-prob))
            return pos_loss, jnp.sum(neg), jnp.sum(valid.astype(jnp.float32))

        pos_l, neg_l, n_gt = jax.vmap(one_image)(cls_prob, reg_flat,
                                                 gt_bboxes, gt_labels,
                                                 gt_valid)
        num_pos = jnp.maximum(jnp.sum(n_gt), 1.0)
        return dict(
            positive_bag_loss=jnp.sum(pos_l) / num_pos,
            negative_bag_loss=jnp.sum(neg_l) / (num_pos * K),
            num_gts=jnp.mean(n_gt))
