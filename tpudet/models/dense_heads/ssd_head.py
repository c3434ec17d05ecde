"""SSD head (reference mmdet/models/dense_heads/ssd_head.py): per-level
3x3 cls/reg convs, softmax cross-entropy with OHEM hard-negative mining
(neg:pos 3:1), smooth-L1 regression on DeltaXYWH targets.

Shape-static OHEM: negatives are ranked by their CE loss; a dynamic count
(3 x num_pos) selects the loss threshold via a sorted gather — no dynamic
shapes.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors import SSDAnchorGenerator
from ...core.assigners import max_iou_assign_batch
from ...core.bbox import DeltaXYWHBBoxCoder
from ...core.nms import batched_nms
from ...registry import HEADS
from .. import losses as L


@HEADS.register_module()
class SSDHead(nn.Module):
    num_classes: int = 80
    in_channels: Sequence[int] = (512, 1024, 512, 256, 256, 256)
    strides: Tuple[int, ...] = (8, 16, 32, 64, 100, 300)
    ratios: Tuple = ((2,), (2, 3), (2, 3), (2, 3), (2,), (2,))
    basesize_ratio_range: Tuple[float, float] = (0.15, 0.9)
    input_size: int = 300
    # SSD convention (reference configs/_base_/models/ssd300.py): ratio
    # varies fastest within each scale
    scale_major: bool = False
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    neg_pos_ratio: int = 3
    smoothl1_beta: float = 1.0
    dtype: Any = None

    @property
    def anchor_generator(self) -> SSDAnchorGenerator:
        return SSDAnchorGenerator(
            strides=list(self.strides), ratios=[list(r) for r in self.ratios],
            basesize_ratio_range=tuple(self.basesize_ratio_range),
            input_size=self.input_size, scale_major=self.scale_major)

    @property
    def bbox_coder(self):
        return DeltaXYWHBBoxCoder(target_stds=self.target_stds)

    @property
    def cls_out_channels(self):
        return self.num_classes + 1  # softmax with background column

    @nn.compact
    def __call__(self, feats, train: bool = False):
        gen = self.anchor_generator
        cls_out, reg_out = [], []
        for i, feat in enumerate(feats):
            a = gen.num_base_anchors[i]
            cls_out.append(
                nn.Conv(a * self.cls_out_channels, (3, 3), padding='SAME',
                        dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f'cls_conv{i}')(feat))
            reg_out.append(
                nn.Conv(a * 4, (3, 3), padding='SAME', dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f'reg_conv{i}')(feat))
        return tuple(cls_out), tuple(reg_out)

    # ------------------------------------------------------------------
    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        cls_scores, bbox_preds = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        anchors = jnp.asarray(np.concatenate(
            self.anchor_generator.grid_anchors(featmap_sizes)))
        b = cls_scores[0].shape[0]
        cls_flat = jnp.concatenate([
            c.reshape(b, -1, self.cls_out_channels).astype(jnp.float32)
            for c in cls_scores], axis=1)
        reg_flat = jnp.concatenate([
            r.reshape(b, -1, 4).astype(jnp.float32) for r in bbox_preds],
            axis=1)

        assigned = max_iou_assign_batch(anchors, gt_bboxes, gt_valid,
                                        self.pos_iou_thr, self.neg_iou_thr,
                                        0.0, True)
        pos = assigned >= 0
        neg = assigned == -1
        # reference normalizer: sum over images of max(num_pos_img, 1)
        # (anchor_head.py get_targets: num_total_pos = sum(max(inds, 1)))
        num_pos = jnp.sum(jnp.maximum(
            jnp.sum(pos.astype(jnp.float32), axis=1), 1.0))

        gt_idx = jnp.clip(assigned, 0, None)
        labels = jnp.where(
            pos, jnp.take_along_axis(gt_labels, gt_idx, axis=1),
            self.num_classes)  # background = num_classes (last column)
        ce = -jnp.take_along_axis(
            jax.nn.log_softmax(cls_flat, axis=-1), labels[..., None],
            axis=-1)[..., 0]

        # OHEM: per image keep exactly the 3*num_pos_i highest-loss
        # negatives (reference ssd_head.loss_single): rank negatives by CE
        # and keep rank < k_i — rank-based, so score ties cannot
        # over-select
        neg_ce = jnp.where(neg, ce, -1.0)
        order = jnp.argsort(-neg_ce, axis=1)
        rank = jnp.argsort(order, axis=1)  # rank of each anchor's neg loss
        pos_per_img = jnp.sum(pos, axis=1)
        # NOTE: unlike YOLACT's loss_single_OHEM, the reference SSD
        # (ssd_head.py:157-160) has NO zero-pos fallback — an image with
        # no positives contributes 3*0 = 0 negatives (zero cls loss)
        k_i = self.neg_pos_ratio * pos_per_img
        neg_keep = neg & (rank < k_i[:, None])

        loss_cls = jnp.sum(ce * (pos | neg_keep)) / num_pos

        matched = jnp.take_along_axis(gt_bboxes, gt_idx[..., None], axis=1)
        matched = jnp.where(pos[..., None], matched,
                            jnp.broadcast_to(anchors[None], matched.shape))
        deltas = self.bbox_coder.encode(anchors[None], matched)
        loss_bbox = L.smooth_l1_loss(
            reg_flat, deltas, beta=self.smoothl1_beta,
            weight=pos[..., None].astype(jnp.float32), avg_factor=num_pos)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    num_gts=jnp.mean(jnp.sum(gt_valid.astype(jnp.float32),
                                             axis=1)))

    # ------------------------------------------------------------------
    def get_bboxes(self, preds, scale_factors=None, score_thr: float = 0.02,
                   iou_thr: float = 0.45, max_per_img: int = 200,
                   nms_pre: int = 1000, img_shape=None, with_nms: bool = True,
                   **kwargs):
        cls_scores, bbox_preds = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        anchors = jnp.asarray(np.concatenate(
            self.anchor_generator.grid_anchors(featmap_sizes)))
        b = cls_scores[0].shape[0]
        cls_flat = jnp.concatenate([
            c.reshape(b, -1, self.cls_out_channels).astype(jnp.float32)
            for c in cls_scores], axis=1)
        reg_flat = jnp.concatenate([
            r.reshape(b, -1, 4).astype(jnp.float32) for r in bbox_preds],
            axis=1)
        softmax_scores = jax.nn.softmax(cls_flat, axis=-1)
        boxes = self.bbox_coder.decode(anchors[None], reg_flat,
                                       max_shape=img_shape)
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, :]
        if not with_nms:
            # raw reference return keeps the bg column (anchor_head.py:705)
            return boxes, softmax_scores
        scores = softmax_scores[..., :-1]  # drop bg
        return batched_nms(boxes, scores, score_thr, iou_thr, max_per_img,
                           nms_pre=min(2048, scores.shape[1]))


from ...registry import DETECTORS  # noqa: E402
from ..detectors.single_stage import SingleStageDetector  # noqa: E402


@DETECTORS.register_module()
class SSD(SingleStageDetector):
    """SSD detector (reference mmdet/models/detectors/ssd.py wrapper)."""

    def get_bboxes(self, pred_maps, **kwargs):
        cfg = dict(self.test_cfg or {})
        nms_cfg = cfg.pop('nms', None)
        if nms_cfg is not None:
            cfg['iou_thr'] = nms_cfg.get('iou_threshold', 0.45)
        cfg.pop('min_bbox_size', None)
        cfg.update(kwargs)
        return self.bbox_head.get_bboxes(pred_maps, **cfg)