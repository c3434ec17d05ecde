"""RPN head (reference mmdet/models/dense_heads/rpn_head.py): shared 3x3
conv, 1x1 objectness + 1x1 deltas over A=3 anchors per cell, 5 FPN levels.

Shape-static proposal generation: per-level top-k by score -> decode ->
clip -> one class-aware NMS with level ids as the "classes" (mmdet 2.x
semantics) -> padded (max_num, 4) proposals + validity.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors import AnchorGenerator
from ...core.assigners import NEGATIVE, max_iou_assign_batch
from ...core.bbox import DeltaXYWHBBoxCoder
from ...core.nms import nms_padded
from ...registry import HEADS
from .. import losses as L


@HEADS.register_module()
class RPNHead(nn.Module):
    in_channels: int = 256
    feat_channels: int = 256
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    anchor_scales: Tuple[float, ...] = (8,)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    # train cfg (reference configs/_base_/models/faster_rcnn_r50_fpn.py)
    pos_iou_thr: float = 0.7
    neg_iou_thr: float = 0.3
    min_pos_iou: float = 0.3
    num_samples: int = 256
    pos_fraction: float = 0.5
    dtype: Any = None

    @property
    def num_anchors(self):
        return len(self.anchor_scales) * len(self.anchor_ratios)

    @property
    def anchor_generator(self) -> AnchorGenerator:
        return AnchorGenerator(strides=list(self.strides),
                               ratios=list(self.anchor_ratios),
                               scales=list(self.anchor_scales))

    @property
    def bbox_coder(self):
        return DeltaXYWHBBoxCoder()

    @nn.compact
    def __call__(self, feats, train: bool = False):
        conv = nn.Conv(self.feat_channels, (3, 3), padding='SAME',
                       dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       name='rpn_conv')
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      kernel_init=nn.initializers.normal(0.01),
                      name='rpn_cls')
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                      kernel_init=nn.initializers.normal(0.01),
                      name='rpn_reg')
        cls_out, reg_out = [], []
        for feat in feats:
            x = jax.nn.relu(conv(feat))
            cls_out.append(cls(x))
            reg_out.append(reg(x))
        return tuple(cls_out), tuple(reg_out)

    # ------------------------------------------------------------------
    def _flat_anchors(self, featmap_sizes):
        return np.concatenate(
            self.anchor_generator.grid_anchors(featmap_sizes))

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid,
             sample_priority=None) -> Dict:
        """BCE objectness + L1 deltas on 256 sampled anchors/img (1:1).

        Sampling uses a fixed pseudo-random anchor priority
        (``sample_priority``) instead of a per-step RNG — deterministic,
        shape-static replacement for mmdet's RandomSampler.
        """
        cls_scores, bbox_preds = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        anchors = jnp.asarray(self._flat_anchors(featmap_sizes))
        b = cls_scores[0].shape[0]
        cls_flat = jnp.concatenate([
            c.reshape(b, -1).astype(jnp.float32) for c in cls_scores],
            axis=1)
        reg_flat = jnp.concatenate([
            r.reshape(b, -1, 4).astype(jnp.float32) for r in bbox_preds],
            axis=1)
        n_anchors = cls_flat.shape[1]

        assigned = max_iou_assign_batch(anchors, gt_bboxes, gt_valid,
                                        self.pos_iou_thr, self.neg_iou_thr,
                                        self.min_pos_iou, True)
        pos = assigned >= 0
        neg = assigned == NEGATIVE

        if sample_priority is None:
            sample_priority = jnp.asarray(
                np.random.RandomState(0).rand(n_anchors).astype(np.float32))
        max_pos = int(self.num_samples * self.pos_fraction)
        # rank positives / negatives by priority; keep caps per image
        pos_rank = jnp.argsort(jnp.argsort(
            jnp.where(pos, sample_priority[None], 2.0), axis=1), axis=1)
        num_pos = jnp.sum(pos, axis=1, keepdims=True)
        pos_keep = pos & (pos_rank < jnp.minimum(num_pos, max_pos))
        n_pos_kept = jnp.sum(pos_keep, axis=1, keepdims=True)
        neg_rank = jnp.argsort(jnp.argsort(
            jnp.where(neg, sample_priority[None], 2.0), axis=1), axis=1)
        neg_keep = neg & (neg_rank < self.num_samples - n_pos_kept)

        sampled = pos_keep | neg_keep
        num_total = jnp.maximum(jnp.sum(sampled.astype(jnp.float32)), 1.0)

        loss_cls = L.bce_loss(cls_flat, pos_keep.astype(jnp.float32),
                              weight=sampled.astype(jnp.float32),
                              avg_factor=num_total)

        gt_idx = jnp.clip(assigned, 0, None)
        matched = jnp.take_along_axis(gt_bboxes, gt_idx[..., None], axis=1)
        matched = jnp.where(pos_keep[..., None], matched,
                            jnp.broadcast_to(anchors[None], matched.shape))
        deltas = self.bbox_coder.encode(anchors[None], matched)
        loss_bbox = L.l1_loss(reg_flat, deltas,
                              weight=pos_keep[..., None].astype(jnp.float32),
                              avg_factor=num_total)
        return dict(loss_rpn_cls=loss_cls, loss_rpn_bbox=loss_bbox)

    # ------------------------------------------------------------------
    def get_proposals(self, preds, img_shape=None, nms_pre: int = 1000,
                      max_num: int = 1000, iou_thr: float = 0.7,
                      min_bbox_size: float = 0.):
        """(B, max_num, 4) padded proposals + (B, max_num) validity."""
        cls_scores, bbox_preds = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        mlvl_anchors = self.anchor_generator.grid_anchors(featmap_sizes)
        b = cls_scores[0].shape[0]

        boxes_all, scores_all, level_all = [], [], []
        for lvl in range(len(cls_scores)):
            scores = jax.nn.sigmoid(
                cls_scores[lvl].reshape(b, -1).astype(jnp.float32))
            deltas = bbox_preds[lvl].reshape(b, -1, 4).astype(jnp.float32)
            anchors = jnp.asarray(mlvl_anchors[lvl])
            k = min(nms_pre, scores.shape[1])
            if 0 < k < scores.shape[1]:
                scores, topk = jax.lax.top_k(scores, k)
                deltas = jnp.take_along_axis(deltas, topk[..., None], axis=1)
                lvl_anchors = anchors[topk]
            else:
                lvl_anchors = jnp.broadcast_to(anchors[None],
                                               (b,) + anchors.shape)
            boxes = self.bbox_coder.decode(lvl_anchors, deltas,
                                           max_shape=img_shape)
            boxes_all.append(boxes)
            scores_all.append(scores)
            level_all.append(jnp.full(scores.shape, lvl, jnp.float32))

        boxes = jnp.concatenate(boxes_all, axis=1)
        scores = jnp.concatenate(scores_all, axis=1)
        levels = jnp.concatenate(level_all, axis=1)
        # reference rpn_head.py:235-245: the min-size filter only runs
        # when min_bbox_size > 0, and compares with >= — at the default 0
        # even degenerate zero-width proposals stay in (they IoU 0 with
        # everything, so they only occupy ranking slots)
        if min_bbox_size > 0:
            w = boxes[..., 2] - boxes[..., 0]
            h = boxes[..., 3] - boxes[..., 1]
            valid = (w >= min_bbox_size) & (h >= min_bbox_size)
        else:
            valid = jnp.ones(boxes.shape[:-1], bool)

        # level-aware NMS via coordinate offset (mmdet 2.x rpn semantics)
        max_coord = jnp.max(jnp.where(valid[..., None], boxes, 0.))
        offset_boxes = boxes + (levels * (max_coord + 1.))[..., None]

        def one(ob, s, v, bx):
            keep_idx, keep_valid = nms_padded(ob, s, iou_thr, max_num, v)
            return (jnp.where(keep_valid[:, None], bx[keep_idx], 0.),
                    jnp.where(keep_valid, s[keep_idx], 0.), keep_valid)

        props, pscores, pvalid = jax.vmap(one)(offset_boxes, scores, valid,
                                               boxes)
        return props, pscores, pvalid