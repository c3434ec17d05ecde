"""YOLOF head — single-level dense head with implicit objectness
(reference mmdet/models/dense_heads/yolof_head.py:42).

Shape-static rebuild: cls/reg conv+BN subnets on the DilatedEncoder output,
the implicit-objectness score merge (yolof_head.py:118-134:
``cls + obj - log(1 + exp(cls) + exp(obj))``), uniform matching targets
(tpudet/core/assigners.py::uniform_assign) and focal + GIoU losses.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.anchors import AnchorGenerator
from ...core.assigners import (IGNORE, NEGATIVE, uniform_assign_batch,
                               uniform_match_pairs_batch)
from ...core.bbox import DeltaXYWHBBoxCoder
from ...core.nms import batched_nms
from ...registry import HEADS
from .. import losses as L
from ..layers import ConvModule

INF = 1e8


@HEADS.register_module()
class YOLOFHead(nn.Module):
    num_classes: int
    in_channels: int = 512
    num_cls_convs: int = 2
    num_reg_convs: int = 4
    stride: int = 32
    anchor_scales: Tuple[int, ...] = (1, 2, 4, 8, 16)
    # train cfg (reference configs/yolof/yolof_r50_c5_8x8_1x_coco.py)
    match_times: int = 4
    pos_ignore_thr: float = 0.15
    neg_ignore_thr: float = 0.7
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.0
    dtype: Any = None

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_scales)

    @property
    def anchor_generator(self) -> AnchorGenerator:
        return AnchorGenerator(strides=[self.stride], ratios=[1.0],
                               scales=list(self.anchor_scales))

    @property
    def bbox_coder(self) -> DeltaXYWHBBoxCoder:
        return DeltaXYWHBBoxCoder((0., 0., 0., 0.), (1., 1., 1., 1.),
                                  add_ctr_clamp=True, ctr_clamp=32)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats
        prior_bias = float(-math.log((1 - 0.01) / 0.01))

        c = x
        for i in range(self.num_cls_convs):
            c = ConvModule(self.in_channels, 3, act='ReLU', use_bias=True,
                           dtype=self.dtype, name=f'cls_subnet{i}')(c, train)
        r = x
        for i in range(self.num_reg_convs):
            r = ConvModule(self.in_channels, 3, act='ReLU', use_bias=True,
                           dtype=self.dtype, name=f'bbox_subnet{i}')(r, train)
        cls_score = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                            padding='SAME', use_bias=True, dtype=self.dtype,
                            kernel_init=nn.initializers.normal(0.01),
                            bias_init=nn.initializers.constant(prior_bias),
                            name='cls_score')(c)
        bbox_pred = nn.Conv(self.num_anchors * 4, (3, 3), padding='SAME',
                            use_bias=True, dtype=self.dtype,
                            kernel_init=nn.initializers.normal(0.01),
                            name='bbox_pred')(r)
        objectness = nn.Conv(self.num_anchors, (3, 3), padding='SAME',
                             use_bias=True, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name='object_pred')(r)

        # implicit objectness merge (yolof_head.py:126-133), fp32 for the
        # exp/log stability clamp
        b, h, w, _ = cls_score.shape
        cls = cls_score.astype(jnp.float32).reshape(
            b, h, w, self.num_anchors, self.num_classes)
        obj = objectness.astype(jnp.float32).reshape(
            b, h, w, self.num_anchors, 1)
        norm = cls + obj - jnp.log(
            1. + jnp.clip(jnp.exp(cls), None, INF) +
            jnp.clip(jnp.exp(obj), None, INF))
        norm = norm.reshape(b, h, w, self.num_anchors * self.num_classes)
        return (norm,), (bbox_pred,)

    # ------------------------------------------------------------------
    def _anchors(self, featmap_size):
        import numpy as np
        return np.concatenate(
            self.anchor_generator.grid_anchors([featmap_size]), axis=0)

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        cls_scores, bbox_preds = preds
        featmap_size = tuple(cls_scores[0].shape[1:3])
        anchors = jnp.asarray(self._anchors(featmap_size))  # (A, 4)
        b = cls_scores[0].shape[0]

        cls_flat = cls_scores[0].reshape(b, -1, self.num_classes).astype(
            jnp.float32)
        reg_flat = bbox_preds[0].reshape(b, -1, 4).astype(jnp.float32)
        pred_boxes = self.bbox_coder.decode(anchors[None], reg_flat)

        assigned = uniform_assign_batch(
            pred_boxes, anchors, gt_bboxes, gt_valid, self.match_times,
            self.pos_ignore_thr, self.neg_ignore_thr)  # (B, A)
        pos = assigned >= 0
        neg = assigned == NEGATIVE
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)

        gt_idx = jnp.clip(assigned, 0, None)
        matched_labels = jnp.take_along_axis(gt_labels, gt_idx, axis=1)
        onehot = jax.nn.one_hot(matched_labels, self.num_classes,
                                dtype=jnp.float32) * pos[..., None]
        label_weights = (pos | neg).astype(jnp.float32)[..., None]
        loss_cls = L.sigmoid_focal_loss(
            cls_flat, onehot, gamma=self.focal_gamma, alpha=self.focal_alpha,
            weight=label_weights, avg_factor=num_pos,
            loss_weight=self.loss_cls_weight)

        # the reference regresses every candidate PAIR (duplicates
        # included) against the pair's own gt, normalized by the count of
        # unique positive anchors (yolof_head.py loss + uniform_assigner
        # extra properties)
        pair_a, pair_g, pair_pos = uniform_match_pairs_batch(
            pred_boxes, anchors, gt_bboxes, gt_valid, self.match_times,
            self.pos_ignore_thr)
        pair_pred = jnp.take_along_axis(pred_boxes, pair_a[..., None],
                                        axis=1)
        pair_tgt = jnp.take_along_axis(gt_bboxes, pair_g[..., None], axis=1)
        pair_tgt = jnp.where(pair_pos[..., None], pair_tgt, pair_pred)
        loss_bbox = L.giou_loss(
            pair_pred, pair_tgt, weight=pair_pos.astype(jnp.float32),
            avg_factor=num_pos, loss_weight=self.loss_bbox_weight)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    num_gts=jnp.mean(jnp.sum(gt_valid.astype(jnp.float32),
                                             axis=1)))

    # ------------------------------------------------------------------
    def get_bboxes(self, preds, scale_factors=None, score_thr: float = 0.05,
                   iou_thr: float = 0.6, max_per_img: int = 100,
                   nms_pre: int = 1000, img_shape=None,
                   with_nms: bool = True, **kwargs):
        """Decode + NMS (reference anchor_head.py::_get_bboxes shared
        path: top-k by max sigmoid score, ctr-clamped DeltaXYWH decode
        clipped to ``img_shape``)."""
        cls_scores, bbox_preds = preds
        featmap_size = tuple(cls_scores[0].shape[1:3])
        anchors = jnp.asarray(self._anchors(featmap_size))
        b = cls_scores[0].shape[0]
        scores = jax.nn.sigmoid(
            cls_scores[0].reshape(b, -1, self.num_classes).astype(
                jnp.float32))
        deltas = bbox_preds[0].reshape(b, -1, 4).astype(jnp.float32)
        k = min(nms_pre, scores.shape[1]) if with_nms else 0
        if 0 < k < scores.shape[1]:
            max_scores = jnp.max(scores, axis=-1)
            _, topk = jax.lax.top_k(max_scores, k)
            scores = jnp.take_along_axis(scores, topk[..., None], axis=1)
            deltas = jnp.take_along_axis(deltas, topk[..., None], axis=1)
            sel_anchors = anchors[topk]
        else:
            sel_anchors = jnp.broadcast_to(anchors[None], (b,) + anchors.shape)
        boxes = self.bbox_coder.decode(sel_anchors, deltas,
                                       max_shape=img_shape)
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, :]
        if not with_nms:
            return boxes, scores
        return batched_nms(boxes, scores, score_thr, iou_thr, max_per_img,
                           nms_pre=min(4096, boxes.shape[1]))
