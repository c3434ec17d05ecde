"""ATSS head (reference mmdet/models/dense_heads/atss_head.py):
RetinaNet-style cls/reg towers with a single anchor per cell, a centerness
branch, the Adaptive Training Sample Selection assigner (dense version in
tpudet/core/assigners.py), focal cls loss, centerness-weighted GIoU
regression on DeltaXYWH-decoded boxes (reference bbox_coder
target_stds=[0.1, 0.1, 0.2, 0.2], atss_r50_fpn_1x_coco.py:36-39), and BCE
centerness.
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
from ...core.bbox import DeltaXYWHBBoxCoder
from ...core.nms import batched_nms
from ...registry import HEADS
from .. import losses as L


@HEADS.register_module()
class ATSSHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    octave_base_scale: int = 8
    topk: int = 9
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_bbox_weight: float = 2.0
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    dtype: Any = None

    @property
    def bbox_coder(self):
        return DeltaXYWHBBoxCoder(target_stds=self.target_stds)

    @property
    def anchor_generator(self) -> AnchorGenerator:
        return AnchorGenerator(strides=list(self.strides), ratios=[1.0],
                               octave_base_scale=self.octave_base_scale,
                               scales_per_octave=1)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        prior_bias = float(-math.log((1 - 0.01) / 0.01))

        def tower(name):
            return [
                nn.Conv(self.feat_channels, (3, 3), padding='SAME',
                        dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.01),
                        name=f'{name}_conv{i}')
                for i in range(self.stacked_convs)
            ]

        cls_tower, reg_tower = tower('cls'), tower('reg')
        atss_cls = nn.Conv(self.num_classes, (3, 3), padding='SAME',
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(prior_bias),
                           name='atss_cls')
        atss_reg = nn.Conv(4, (3, 3), padding='SAME', dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='atss_reg')
        atss_ctr = nn.Conv(1, (3, 3), padding='SAME', dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='atss_centerness')
        scales = self.param('scales', nn.initializers.ones,
                            (len(self.strides),))
        cls_out, reg_out, ctr_out = [], [], []
        for lvl, feat in enumerate(feats):
            c = feat
            for conv in cls_tower:
                c = jax.nn.relu(conv(c))
            r = feat
            for conv in reg_tower:
                r = jax.nn.relu(conv(r))
            cls_out.append(atss_cls(c))
            # DeltaXYWH deltas, per-level learnable Scale on the reg conv
            # output (reference forward_single: scale(atss_reg(x)).float())
            reg_out.append(atss_reg(r).astype(jnp.float32) * scales[lvl])
            ctr_out.append(atss_ctr(r))
        return tuple(cls_out), tuple(reg_out), tuple(ctr_out)

    # ------------------------------------------------------------------
    def _anchors_and_counts(self, featmap_sizes):
        per_level = self.anchor_generator.grid_anchors(featmap_sizes)
        return (np.concatenate(per_level),
                [len(a) for a in per_level])

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        cls_scores, bbox_preds, centernesses = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        anchors_np, counts = self._anchors_and_counts(featmap_sizes)
        anchors = jnp.asarray(anchors_np)
        centers = jnp.stack([(anchors[:, 0] + anchors[:, 2]) * 0.5,
                             (anchors[:, 1] + anchors[:, 3]) * 0.5], -1)
        b = cls_scores[0].shape[0]
        cls_flat = jnp.concatenate([
            c.reshape(b, -1, self.num_classes).astype(jnp.float32)
            for c in cls_scores], axis=1)
        reg_flat = jnp.concatenate([
            r.reshape(b, -1, 4).astype(jnp.float32) for r in bbox_preds],
            axis=1)
        ctr_flat = jnp.concatenate([
            c.reshape(b, -1).astype(jnp.float32) for c in centernesses],
            axis=1)

        assigned = atss_assign_batch(anchors, counts, gt_bboxes, gt_valid,
                                     self.topk)  # (B, A)
        pos = assigned >= 0
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        gt_idx = jnp.clip(assigned, 0, None)

        labels = jnp.take_along_axis(gt_labels, gt_idx, axis=1)
        onehot = jax.nn.one_hot(labels, self.num_classes) * pos[..., None]
        loss_cls = L.sigmoid_focal_loss(
            cls_flat, onehot, gamma=self.focal_gamma, alpha=self.focal_alpha,
            avg_factor=num_pos)

        matched = jnp.take_along_axis(gt_bboxes, gt_idx[..., None], axis=1)
        # centerness targets from anchor-center distances to gt sides
        l = centers[None, :, 0] - matched[..., 0]
        t = centers[None, :, 1] - matched[..., 1]
        r_ = matched[..., 2] - centers[None, :, 0]
        bo = matched[..., 3] - centers[None, :, 1]
        lr_min = jnp.minimum(l, r_)
        lr_max = jnp.maximum(jnp.maximum(l, r_), 1e-6)
        tb_min = jnp.minimum(t, bo)
        tb_max = jnp.maximum(jnp.maximum(t, bo), 1e-6)
        ctr_tgt = jnp.sqrt(jnp.clip((lr_min / lr_max) * (tb_min / tb_max),
                                    0., 1.))
        ctr_tgt = jnp.where(pos, ctr_tgt, 0.)

        # reference loss_single: GIoU(bbox_coder.decode(anchor, pred), gt)
        pred_boxes = self.bbox_coder.decode(anchors[None], reg_flat)
        w = ctr_tgt * pos
        # reference atss_head.py:286: bbox_avg_factor clamps at min 1
        loss_bbox = L.giou_loss(
            pred_boxes, matched, weight=w,
            avg_factor=jnp.maximum(jnp.sum(w), 1.0),
            loss_weight=self.loss_bbox_weight)
        loss_ctr = L.bce_loss(ctr_flat, ctr_tgt,
                              weight=pos.astype(jnp.float32),
                              avg_factor=num_pos)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_centerness=loss_ctr,
                    num_gts=jnp.mean(jnp.sum(gt_valid.astype(jnp.float32),
                                             axis=1)))

    # ------------------------------------------------------------------
    def get_bboxes(self, preds, scale_factors=None, score_thr: float = 0.05,
                   iou_thr: float = 0.6, max_per_img: int = 100,
                   nms_pre: int = 1000, img_shape=None, with_nms: bool = True,
                   **kwargs):
        """Decode + NMS (reference atss_head.py _get_bboxes: per-level
        top-k ranked by scores*centerness, DeltaXYWH decode from anchors
        clipped to ``img_shape``, centerness folded into the NMS score)."""
        cls_scores, bbox_preds, centernesses = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        mlvl = self.anchor_generator.grid_anchors(featmap_sizes)
        b = cls_scores[0].shape[0]
        boxes_all, scores_all = [], []
        for lvl in range(len(cls_scores)):
            anchors = jnp.asarray(mlvl[lvl])
            scores = jax.nn.sigmoid(
                cls_scores[lvl].reshape(b, -1, self.num_classes).astype(
                    jnp.float32))
            ctr = jax.nn.sigmoid(
                centernesses[lvl].reshape(b, -1).astype(jnp.float32))
            scores = scores * ctr[..., None]
            deltas = bbox_preds[lvl].reshape(b, -1, 4).astype(jnp.float32)
            k = min(nms_pre, scores.shape[1]) if with_nms else 0
            if 0 < k < scores.shape[1]:
                max_s = jnp.max(scores, axis=-1)
                _, topk = jax.lax.top_k(max_s, k)
                scores = jnp.take_along_axis(scores, topk[..., None], axis=1)
                deltas = jnp.take_along_axis(deltas, topk[..., None], axis=1)
                lvl_anchors = anchors[topk]
            else:
                lvl_anchors = jnp.broadcast_to(anchors[None],
                                               (b,) + anchors.shape)
            boxes_all.append(self.bbox_coder.decode(lvl_anchors, deltas,
                                                    max_shape=img_shape))
            scores_all.append(scores)
        bbox = jnp.concatenate(boxes_all, axis=1)
        scores = jnp.concatenate(scores_all, axis=1)
        if scale_factors is not None:
            bbox = bbox / scale_factors[:, None, :]
        if not with_nms:
            return bbox, scores
        return batched_nms(bbox, scores, score_thr, iou_thr, max_per_img,
                           nms_pre=2048)