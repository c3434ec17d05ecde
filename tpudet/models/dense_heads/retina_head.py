"""RetinaNet head + generic anchor-head loss/decode, shape-static.

Capability rebuild of the reference generic anchor machinery
(mmdet/models/dense_heads/anchor_head.py:741 — get_anchors/get_targets/
loss/get_bboxes — and retina_head.py:114): 4-deep cls/reg conv stacks, A=9
anchors per cell over 5 pyramid levels, sigmoid focal loss with the 0.01
prior bias, DeltaXYWH regression with L1 loss, per-level top-k -> padded
class-aware NMS at test time.

Target assignment uses the dense MaxIoU assigner
(tpudet/core/assigners.py) over padded gts instead of AssignResult lists;
all means use masked avg_factors identical to the reference's
num_total_pos normalization.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors import AnchorGenerator
from ...core.assigners import NEGATIVE, max_iou_assign_batch
from ...core.bbox import DeltaXYWHBBoxCoder
from ...core.nms import batched_nms
from ...registry import HEADS
from .. import losses as L


def _conv(features, dtype=None, name=None, bias_init=None):
    return nn.Conv(features, (3, 3), (1, 1), padding=[(1, 1), (1, 1)],
                   use_bias=True, dtype=dtype,
                   kernel_init=nn.initializers.normal(0.01),
                   bias_init=bias_init or nn.initializers.zeros,
                   name=name)


@HEADS.register_module()
class RetinaHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    octave_base_scale: int = 4
    scales_per_octave: int = 3
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    target_means: Tuple[float, ...] = (0., 0., 0., 0.)
    target_stds: Tuple[float, ...] = (1., 1., 1., 1.)
    # train cfg (reference configs/_base_/models/retinanet_r50_fpn.py)
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    min_pos_iou: float = 0.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.0
    use_ghm: bool = False  # GHM-C cls loss (configs/ghm/retinanet_ghm_*)
    dtype: Any = None

    @property
    def num_anchors(self) -> int:
        return len(self.ratios) * self.scales_per_octave

    @property
    def anchor_generator(self) -> AnchorGenerator:
        return AnchorGenerator(
            strides=list(self.strides), ratios=list(self.ratios),
            octave_base_scale=self.octave_base_scale,
            scales_per_octave=self.scales_per_octave)

    @property
    def bbox_coder(self) -> DeltaXYWHBBoxCoder:
        return DeltaXYWHBBoxCoder(self.target_means, self.target_stds)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # prior-prob bias so initial cls activations are ~0.01
        # (reference retina_head.py init: bias_init_with_prob(0.01))
        prior_bias = float(-math.log((1 - 0.01) / 0.01))
        cls_out, reg_out = [], []
        cls_convs = [
            _conv(self.feat_channels, self.dtype, f'cls_conv{i}')
            for i in range(self.stacked_convs)
        ]
        reg_convs = [
            _conv(self.feat_channels, self.dtype, f'reg_conv{i}')
            for i in range(self.stacked_convs)
        ]
        retina_cls = _conv(
            self.num_anchors * self.num_classes, self.dtype, 'retina_cls',
            bias_init=nn.initializers.constant(prior_bias))
        retina_reg = _conv(self.num_anchors * 4, self.dtype, 'retina_reg')
        for feat in feats:
            c = feat
            for conv in cls_convs:
                c = jax.nn.relu(conv(c))
            r = feat
            for conv in reg_convs:
                r = jax.nn.relu(conv(r))
            cls_out.append(retina_cls(c))
            reg_out.append(retina_reg(r))
        return tuple(cls_out), tuple(reg_out)

    # ------------------------------------------------------------------
    def _flat_anchors(self, featmap_sizes) -> np.ndarray:
        return np.concatenate(
            self.anchor_generator.grid_anchors(featmap_sizes), axis=0)

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        """Focal + L1 loss over all anchors (reference anchor_head.py:422).

        preds: (cls_scores, bbox_preds) per-level tuples from __call__.
        """
        cls_scores, bbox_preds = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        anchors = jnp.asarray(self._flat_anchors(featmap_sizes))
        b = cls_scores[0].shape[0]

        cls_flat = jnp.concatenate([
            c.reshape(b, -1, self.num_classes).astype(jnp.float32)
            for c in cls_scores
        ], axis=1)  # (B, A, C)
        reg_flat = jnp.concatenate([
            r.reshape(b, -1, 4).astype(jnp.float32) for r in bbox_preds
        ], axis=1)  # (B, A, 4)

        assigned = max_iou_assign_batch(
            anchors, gt_bboxes, gt_valid, self.pos_iou_thr,
            self.neg_iou_thr, self.min_pos_iou, True)  # (B, A)

        pos = assigned >= 0
        neg = assigned == NEGATIVE
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)

        gt_idx = jnp.clip(assigned, 0, None)
        matched_labels = jnp.take_along_axis(gt_labels, gt_idx, axis=1)
        onehot = jax.nn.one_hot(matched_labels, self.num_classes,
                                dtype=jnp.float32) * pos[..., None]
        label_weights = (pos | neg).astype(jnp.float32)[..., None]
        if self.use_ghm:
            # reference configs/ghm/retinanet_ghm_r50_fpn_1x_coco.py:
            # GHMC bins=30; GHMR mu=0.02, bins=10, loss_weight=10
            loss_cls = L.ghm_c_loss(
                cls_flat, onehot, bins=30,
                label_weight=jnp.broadcast_to(label_weights, cls_flat.shape),
                loss_weight=self.loss_cls_weight)
        else:
            loss_cls = L.sigmoid_focal_loss(
                cls_flat, onehot, gamma=self.focal_gamma,
                alpha=self.focal_alpha, weight=label_weights,
                avg_factor=num_pos, loss_weight=self.loss_cls_weight)

        matched_boxes = jnp.take_along_axis(
            gt_bboxes, gt_idx[..., None], axis=1)
        # masked-out slots get the anchor itself as target (delta 0) so the
        # log() in encode never sees a zero-size padded gt box
        matched_boxes = jnp.where(pos[..., None], matched_boxes,
                                  jnp.broadcast_to(anchors[None],
                                                   matched_boxes.shape))
        target_deltas = self.bbox_coder.encode(anchors[None], matched_boxes)
        if self.use_ghm:
            loss_bbox = L.ghm_r_loss(
                reg_flat, target_deltas,
                label_weight=jnp.broadcast_to(
                    pos[..., None].astype(jnp.float32), reg_flat.shape),
                mu=0.02, bins=10,
                loss_weight=10.0 * self.loss_bbox_weight)
        else:
            loss_bbox = L.l1_loss(
                reg_flat, target_deltas,
                weight=pos[..., None].astype(jnp.float32),
                avg_factor=num_pos, loss_weight=self.loss_bbox_weight)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    num_gts=jnp.mean(jnp.sum(gt_valid.astype(jnp.float32),
                                             axis=1)))

    # ------------------------------------------------------------------
    def get_bboxes(self, preds, scale_factors=None, score_thr: float = 0.05,
                   iou_thr: float = 0.5, max_per_img: int = 100,
                   nms_pre: int = 1000, img_shape=None, with_nms: bool = True,
                   nms_type: str = 'nms', sigma: float = 0.5,
                   min_score: float = 1e-3, method: str = 'linear',
                   **kwargs):
        """Per-level top-k -> decode -> padded class-aware NMS
        (reference anchor_head.py:492-740 path).

        ``with_nms=False`` mirrors the reference's raw-decode return:
        ``(boxes clipped to img_shape, sigmoid scores + bg column)``.
        """
        cls_scores, bbox_preds = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        mlvl_anchors = self.anchor_generator.grid_anchors(featmap_sizes)
        b = cls_scores[0].shape[0]

        all_boxes, all_scores = [], []
        for lvl in range(len(cls_scores)):
            scores = jax.nn.sigmoid(
                cls_scores[lvl].reshape(b, -1, self.num_classes).astype(
                    jnp.float32))
            deltas = bbox_preds[lvl].reshape(b, -1, 4).astype(jnp.float32)
            anchors = jnp.asarray(mlvl_anchors[lvl])
            k = min(nms_pre, scores.shape[1]) if with_nms else 0
            if 0 < k < scores.shape[1]:
                max_scores = jnp.max(scores, axis=-1)
                _, topk = jax.lax.top_k(max_scores, k)
                scores = jnp.take_along_axis(scores, topk[..., None], axis=1)
                deltas = jnp.take_along_axis(deltas, topk[..., None], axis=1)
                lvl_anchors = anchors[topk]
            else:
                lvl_anchors = jnp.broadcast_to(anchors[None],
                                               (b,) + anchors.shape)
            boxes = self.bbox_coder.decode(lvl_anchors, deltas,
                                           max_shape=img_shape)
            all_boxes.append(boxes)
            all_scores.append(scores)

        bbox = jnp.concatenate(all_boxes, axis=1)
        scores = jnp.concatenate(all_scores, axis=1)
        if scale_factors is not None:
            bbox = bbox / scale_factors[:, None, :]
        if not with_nms:
            padding = jnp.zeros(scores.shape[:-1] + (1,), scores.dtype)
            return bbox, jnp.concatenate([scores, padding], axis=-1)
        return batched_nms(bbox, scores, score_thr, iou_thr, max_per_img,
                           nms_pre=min(4096, bbox.shape[1] *
                                       self.num_classes),
                           nms_type=nms_type, sigma=sigma,
                           min_score=min_score, method=method)
