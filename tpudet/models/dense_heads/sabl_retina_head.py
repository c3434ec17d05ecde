"""SABL RetinaNet head (reference
mmdet/models/dense_heads/sabl_retina_head.py + the bucketing coder).

Side-Aware Boundary Localization: one square anchor per cell (scale 4);
each box side is localized by bucket classification (sigmoid BCE over
``side_num`` buckets of the 3x-rescaled anchor, nearest bucket positive,
second-nearest ignored) plus fine within-bucket offsets (smooth-L1
beta=1/9), both weighted 1.5; focal classification. Assignment follows
the ApproxMaxIoUAssigner: the cell's IoU is the max over a 3-scale x
3-ratio approx anchor set (approx_max_iou_assigner.py). Detection scores
are rescored by the mean top-bucket confidence.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors import AnchorGenerator
from ...core.assigners import NEGATIVE
from ...core.bbox import BucketingBBoxCoder, bbox_overlaps
from ...core.nms import batched_nms
from ...registry import DETECTORS, HEADS
from .. import losses as L
from ..detectors.single_stage import SingleStageDetector


@HEADS.register_module()
class SABLRetinaHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    square_scale: int = 4
    approx_scales: Tuple[float, ...] = (1.0, 2**(1 / 3), 2**(2 / 3))
    approx_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    num_buckets: int = 14
    scale_factor: float = 3.0
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_bbox_cls_weight: float = 1.5
    loss_bbox_reg_weight: float = 1.5
    dtype: Any = None

    @property
    def side_num(self):
        return int(np.ceil(self.num_buckets / 2.0))

    @property
    def square_generator(self):
        return AnchorGenerator(strides=list(self.strides), ratios=[1.0],
                               scales=[self.square_scale])

    @property
    def approx_generator(self):
        return AnchorGenerator(
            strides=list(self.strides), ratios=list(self.approx_ratios),
            scales=[self.square_scale * s for s in self.approx_scales])

    @property
    def bbox_coder(self):
        return BucketingBBoxCoder(self.num_buckets, self.scale_factor)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        prior_bias = float(-math.log((1 - 0.01) / 0.01))

        def tower(name):
            return [
                nn.Conv(self.feat_channels, (3, 3), padding='SAME',
                        use_bias=True, dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.01),
                        name=f'{name}_conv{i}')
                for i in range(self.stacked_convs)
            ]

        cls_tower, reg_tower = tower('cls'), tower('reg')
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding='SAME',
                           use_bias=True, dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(prior_bias),
                           name='retina_cls')
        conv_bucket_cls = nn.Conv(4 * self.side_num, (3, 3), padding='SAME',
                                  use_bias=True, dtype=self.dtype,
                                  kernel_init=nn.initializers.normal(0.01),
                                  name='retina_bbox_cls')
        conv_bucket_reg = nn.Conv(4 * self.side_num, (3, 3), padding='SAME',
                                  use_bias=True, dtype=self.dtype,
                                  kernel_init=nn.initializers.normal(0.01),
                                  name='retina_bbox_reg')
        cls_out, bcls_out, breg_out = [], [], []
        for feat in feats:
            c = feat
            for conv in cls_tower:
                c = jax.nn.relu(conv(c))
            r = feat
            for conv in reg_tower:
                r = jax.nn.relu(conv(r))
            cls_out.append(conv_cls(c))
            bcls_out.append(conv_bucket_cls(r))
            breg_out.append(conv_bucket_reg(r))
        return tuple(cls_out), tuple(bcls_out), tuple(breg_out)

    # ------------------------------------------------------------------
    def _anchors(self, featmap_sizes):
        squares = np.concatenate(
            self.square_generator.grid_anchors(featmap_sizes))
        approx = np.concatenate(
            self.approx_generator.grid_anchors(featmap_sizes))
        return squares, approx.reshape(len(squares), -1, 4)

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        cls_scores, bucket_cls, bucket_reg = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        squares_np, approx_np = self._anchors(featmap_sizes)
        squares = jnp.asarray(squares_np)  # (A, 4)
        approx = jnp.asarray(approx_np)  # (A, 9, 4)
        b = cls_scores[0].shape[0]
        C = self.num_classes
        S = self.side_num

        cls_flat = jnp.concatenate([
            c.reshape(b, -1, C).astype(jnp.float32) for c in cls_scores
        ], axis=1)
        bcls_flat = jnp.concatenate([
            c.reshape(b, -1, 4 * S).astype(jnp.float32) for c in bucket_cls
        ], axis=1)
        breg_flat = jnp.concatenate([
            c.reshape(b, -1, 4 * S).astype(jnp.float32) for c in bucket_reg
        ], axis=1)

        def assign_one(gts, valid):
            # approx-max IoU: cell iou = max over its 9 approx anchors
            ious = bbox_overlaps(approx.reshape(-1, 4), gts)
            ious = ious.reshape(approx.shape[0], approx.shape[1], -1)
            ious = jnp.max(ious, axis=1)  # (A, G)
            ious = jnp.where(valid[None, :], ious, -1.)
            max_iou = jnp.max(ious, axis=1)
            arg = jnp.argmax(ious, axis=1).astype(jnp.int32)
            out = jnp.full(approx.shape[0], -2, jnp.int32)
            out = jnp.where(max_iou < self.neg_iou_thr, NEGATIVE, out)
            out = jnp.where(max_iou >= self.pos_iou_thr, arg, out)
            # match_low_quality (reference ApproxMaxIoUAssigner default):
            # every gt claims its best-IoU cell even below pos_iou_thr;
            # later gts override on ties (reference loop order)
            gt_max = jnp.max(ious, axis=0)  # (G,)
            is_best = (ious == gt_max[None, :]) & valid[None, :] & \
                (gt_max[None, :] > 0)
            g_ids = jnp.arange(gts.shape[0], dtype=jnp.int32)
            claim = jnp.max(jnp.where(is_best, g_ids[None, :], -1), axis=1)
            out = jnp.where(claim >= 0, claim, out)
            return jnp.where(jnp.any(valid), out, NEGATIVE)

        assigned = jax.vmap(assign_one)(gt_bboxes, gt_valid)
        pos = assigned >= 0
        neg = assigned == NEGATIVE
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        gt_idx = jnp.clip(assigned, 0, None)
        lab = jnp.take_along_axis(gt_labels, gt_idx, axis=1)
        onehot = jax.nn.one_hot(lab, C) * pos[..., None]
        loss_cls = L.sigmoid_focal_loss(
            cls_flat, onehot, gamma=self.focal_gamma, alpha=self.focal_alpha,
            weight=(pos | neg)[..., None].astype(jnp.float32),
            avg_factor=num_pos)

        matched = jnp.take_along_axis(gt_bboxes, gt_idx[..., None], axis=1)
        matched = jnp.where(pos[..., None], matched,
                            jnp.broadcast_to(squares[None], matched.shape))
        labels_t, cls_w, offsets_t, off_w = self.bbox_coder.encode(
            jnp.broadcast_to(squares[None], matched.shape), matched)
        pshape = pos[..., None, None].astype(jnp.float32)
        loss_bucket_cls = L.bce_loss(
            bcls_flat.reshape(labels_t.shape), labels_t,
            weight=cls_w * pshape,
            avg_factor=num_pos * 4 * S,
            loss_weight=self.loss_bbox_cls_weight)
        loss_bucket_reg = L.smooth_l1_loss(
            breg_flat.reshape(offsets_t.shape), offsets_t, beta=1.0 / 9.0,
            # reference avg: num_total_samples * 4 sides * offset_topk(2)
            weight=off_w * pshape, avg_factor=num_pos * 4 * 2,
            loss_weight=self.loss_bbox_reg_weight)
        return dict(loss_cls=loss_cls, loss_bbox_cls=loss_bucket_cls,
                    loss_bbox_reg=loss_bucket_reg,
                    num_gts=jnp.mean(jnp.sum(gt_valid.astype(jnp.float32),
                                             axis=1)))

    # ------------------------------------------------------------------
    def get_bboxes(self, preds, scale_factors=None, score_thr: float = 0.05,
                   iou_thr: float = 0.5, max_per_img: int = 100,
                   nms_pre: int = 1000, **kwargs):
        cls_scores, bucket_cls, bucket_reg = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        mlvl_squares = self.square_generator.grid_anchors(featmap_sizes)
        b = cls_scores[0].shape[0]
        boxes_all, scores_all = [], []
        for lvl in range(len(cls_scores)):
            squares = jnp.asarray(mlvl_squares[lvl])
            scores = jax.nn.sigmoid(
                cls_scores[lvl].reshape(b, -1, self.num_classes).astype(
                    jnp.float32))
            bc = bucket_cls[lvl].reshape(b, -1, 4 * self.side_num).astype(
                jnp.float32)
            br = bucket_reg[lvl].reshape(b, -1, 4 * self.side_num).astype(
                jnp.float32)
            k = min(nms_pre, scores.shape[1])
            if 0 < k < scores.shape[1]:
                max_s = jnp.max(scores, axis=-1)
                _, topk = jax.lax.top_k(max_s, k)
                scores = jnp.take_along_axis(scores, topk[..., None], axis=1)
                bc = jnp.take_along_axis(bc, topk[..., None], axis=1)
                br = jnp.take_along_axis(br, topk[..., None], axis=1)
                sel = squares[topk]
            else:
                sel = jnp.broadcast_to(squares[None], (b,) + squares.shape)
            boxes, conf = self.bbox_coder.decode(sel, (bc, br))
            scores = scores * conf[..., None]  # bucketing-guided rescoring
            boxes_all.append(boxes)
            scores_all.append(scores)
        bbox = jnp.concatenate(boxes_all, axis=1)
        scores = jnp.concatenate(scores_all, axis=1)
        if scale_factors is not None:
            bbox = bbox / scale_factors[:, None, :]
        return batched_nms(bbox, scores, score_thr, iou_thr, max_per_img,
                           nms_pre=2048)


@DETECTORS.register_module()
class SABLRetinaNet(SingleStageDetector):
    """configs/sabl/sabl_retinanet_* (detector type is RetinaNet there;
    registered under a named alias for clarity)."""

    def get_bboxes(self, pred_maps, **kwargs):
        cfg = dict(self.test_cfg or {})
        nms_cfg = cfg.pop('nms', None)
        if nms_cfg is not None:
            cfg['iou_thr'] = nms_cfg.get('iou_threshold', 0.5)
        cfg.pop('min_bbox_size', None)
        cfg.update(kwargs)
        return self.bbox_head.get_bboxes(pred_maps, **cfg)
