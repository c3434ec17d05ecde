"""GFL head (reference mmdet/models/dense_heads/gfl_head.py):
ATSS sample selection + Quality Focal Loss on IoU-soft targets +
Distribution Focal Loss over discretized box distances (reg_max bins) +
GIoU regression on the integral-decoded boxes.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors import AnchorGenerator
from ...core.assigners import atss_assign_batch
from ...core.bbox import bbox_overlaps_aligned
from ...core.nms import batched_nms
from ...registry import HEADS
from .. import losses as L


@HEADS.register_module()
class GFLHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    octave_base_scale: int = 8
    reg_max: int = 16
    topk: int = 9
    loss_dfl_weight: float = 0.25
    loss_bbox_weight: float = 2.0
    dtype: Any = None

    @property
    def anchor_generator(self) -> AnchorGenerator:
        return AnchorGenerator(strides=list(self.strides), ratios=[1.0],
                               octave_base_scale=self.octave_base_scale,
                               scales_per_octave=1)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        prior_bias = float(-math.log((1 - 0.01) / 0.01))
        towers = {
            name: [
                nn.Conv(self.feat_channels, (3, 3), padding='SAME',
                        dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.01),
                        name=f'{name}_conv{i}')
                for i in range(self.stacked_convs)
            ]
            for name in ('cls', 'reg')
        }
        gfl_cls = nn.Conv(self.num_classes, (3, 3), padding='SAME',
                          dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          bias_init=nn.initializers.constant(prior_bias),
                          name='gfl_cls')
        gfl_reg = nn.Conv(4 * (self.reg_max + 1), (3, 3), padding='SAME',
                          dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          name='gfl_reg')
        scales = self.param('scales', nn.initializers.ones,
                            (len(self.strides),))
        cls_out, reg_out = [], []
        for lvl, feat in enumerate(feats):
            c = feat
            for conv in towers['cls']:
                c = jax.nn.relu(conv(c))
            r = feat
            for conv in towers['reg']:
                r = jax.nn.relu(conv(r))
            cls_out.append(gfl_cls(c))
            reg_out.append(gfl_reg(r).astype(jnp.float32) * scales[lvl])
        return tuple(cls_out), tuple(reg_out)

    # ------------------------------------------------------------------
    def _integral(self, reg_logits):
        """(..., 4*(reg_max+1)) logits -> (..., 4) expected distances in
        stride units (the GFL 'integral' operator)."""
        shape = reg_logits.shape[:-1] + (4, self.reg_max + 1)
        p = jax.nn.softmax(reg_logits.reshape(shape), axis=-1)
        bins = jnp.arange(self.reg_max + 1, dtype=jnp.float32)
        return jnp.sum(p * bins, axis=-1)

    @staticmethod
    def _decode(centers, ltrb):
        return jnp.stack([
            centers[..., 0] - ltrb[..., 0], centers[..., 1] - ltrb[..., 1],
            centers[..., 0] + ltrb[..., 2], centers[..., 1] + ltrb[..., 3]
        ], axis=-1)

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        cls_scores, reg_logits = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        per_level = self.anchor_generator.grid_anchors(featmap_sizes)
        counts = [len(a) for a in per_level]
        anchors = jnp.asarray(np.concatenate(per_level))
        centers = jnp.stack([(anchors[:, 0] + anchors[:, 2]) * 0.5,
                             (anchors[:, 1] + anchors[:, 3]) * 0.5], -1)
        stride_per_anchor = jnp.asarray(np.concatenate([
            np.full(counts[i], self.strides[i], np.float32)
            for i in range(len(counts))
        ]))
        b = cls_scores[0].shape[0]
        cls_flat = jnp.concatenate([
            c.reshape(b, -1, self.num_classes).astype(jnp.float32)
            for c in cls_scores], axis=1)
        reg_flat = jnp.concatenate([
            r.reshape(b, -1, 4 * (self.reg_max + 1)) for r in reg_logits],
            axis=1)

        assigned = atss_assign_batch(anchors, counts, gt_bboxes, gt_valid,
                                     self.topk)
        pos = assigned >= 0
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        gt_idx = jnp.clip(assigned, 0, None)
        matched = jnp.take_along_axis(gt_bboxes, gt_idx[..., None], axis=1)

        # decoded predictions (stride units -> image units)
        dists = self._integral(reg_flat) * stride_per_anchor[None, :, None]
        pred_boxes = self._decode(centers[None], dists)
        quality = jax.lax.stop_gradient(
            bbox_overlaps_aligned(pred_boxes, matched)) * pos

        labels = jnp.where(pos,
                           jnp.take_along_axis(gt_labels, gt_idx, axis=1),
                           self.num_classes)
        loss_qfl = L.quality_focal_loss(cls_flat, labels, quality,
                                        avg_factor=num_pos)

        # GIoU/DFL sample weight = the PREDICTED max class score at
        # positives (reference gfl_head.py loss_single: weight_targets =
        # cls_score.detach().sigmoid().max(dim=1)[0]; the decoded IoU is
        # only the QFL quality target), normalized by its global sum
        w = jax.lax.stop_gradient(
            jnp.max(jax.nn.sigmoid(cls_flat), axis=-1)) * pos
        w_sum = jnp.maximum(jnp.sum(w), 1e-6)

        # target distances in bin units, clamped like the reference's
        # bbox2distance (max_dis=reg_max, clamp at max_dis - 0.1)
        tl = (centers[None, :, 0] - matched[..., 0]) / stride_per_anchor
        tt = (centers[None, :, 1] - matched[..., 1]) / stride_per_anchor
        tr = (matched[..., 2] - centers[None, :, 0]) / stride_per_anchor
        tb = (matched[..., 3] - centers[None, :, 1]) / stride_per_anchor
        tgt = jnp.clip(jnp.stack([tl, tt, tr, tb], -1), 0,
                       self.reg_max - 0.1)
        shape = reg_flat.shape[:-1] + (4, self.reg_max + 1)
        loss_dfl = L.distribution_focal_loss(
            reg_flat.reshape(shape), tgt,
            weight=(w[..., None] * pos[..., None]),
            avg_factor=w_sum * 4,
            loss_weight=self.loss_dfl_weight)
        loss_bbox = L.giou_loss(
            pred_boxes, matched, weight=w,
            avg_factor=w_sum,
            loss_weight=self.loss_bbox_weight)
        return dict(loss_cls=loss_qfl, loss_bbox=loss_bbox,
                    loss_dfl=loss_dfl,
                    num_gts=jnp.mean(jnp.sum(gt_valid.astype(jnp.float32),
                                             axis=1)))

    # ------------------------------------------------------------------
    def get_bboxes(self, preds, scale_factors=None, score_thr: float = 0.05,
                   iou_thr: float = 0.6, max_per_img: int = 100,
                   nms_pre: int = 1000, img_shape=None,
                   with_nms: bool = True, **kwargs):
        """Decode + NMS (reference gfl_head.py _get_bboxes: per-level
        top-k by raw cls scores, integral distances * stride decoded from
        anchor centers, distance2bbox clipped to ``img_shape``)."""
        cls_scores, reg_logits = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        mlvl = self.anchor_generator.grid_anchors(featmap_sizes)
        b = cls_scores[0].shape[0]
        boxes_all, scores_all = [], []
        for lvl in range(len(cls_scores)):
            anchors = jnp.asarray(mlvl[lvl])
            centers = jnp.stack([(anchors[:, 0] + anchors[:, 2]) * 0.5,
                                 (anchors[:, 1] + anchors[:, 3]) * 0.5], -1)
            scores = jax.nn.sigmoid(
                cls_scores[lvl].reshape(b, -1, self.num_classes).astype(
                    jnp.float32))
            reg = reg_logits[lvl].reshape(b, -1, 4 * (self.reg_max + 1))
            k = min(nms_pre, scores.shape[1]) if with_nms else 0
            if 0 < k < scores.shape[1]:
                max_s = jnp.max(scores, axis=-1)
                _, topk = jax.lax.top_k(max_s, k)
                scores = jnp.take_along_axis(scores, topk[..., None], axis=1)
                reg = jnp.take_along_axis(reg, topk[..., None], axis=1)
                lvl_centers = centers[topk]
            else:
                lvl_centers = jnp.broadcast_to(centers[None],
                                               (b,) + centers.shape)
            dists = self._integral(reg) * float(self.strides[lvl])
            decoded = self._decode(lvl_centers, dists)
            if img_shape is not None:  # distance2bbox max_shape clip
                decoded = jnp.stack([
                    jnp.clip(decoded[..., 0], 0, img_shape[1]),
                    jnp.clip(decoded[..., 1], 0, img_shape[0]),
                    jnp.clip(decoded[..., 2], 0, img_shape[1]),
                    jnp.clip(decoded[..., 3], 0, img_shape[0])], axis=-1)
            boxes_all.append(decoded)
            scores_all.append(scores)
        bbox = jnp.concatenate(boxes_all, axis=1)
        scores = jnp.concatenate(scores_all, axis=1)
        if scale_factors is not None:
            bbox = bbox / scale_factors[:, None, :]
        if not with_nms:
            return bbox, scores
        return batched_nms(bbox, scores, score_thr, iou_thr, max_per_img,
                           nms_pre=2048)