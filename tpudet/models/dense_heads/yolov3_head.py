"""YOLOv3 head (reference mmdet/models/dense_heads/yolo_head.py:604).

Structure: per level a 3x3 bridge conv + 1x1 pred conv producing
(B, H, W, A*(5+C)), deepest level first (strides [32, 16, 8]).

Loss follows the reference exactly, rebuilt dense/shape-static:
- targets from YOLO responsible flags + GridAssigner
  (tpudet/core/assigners.grid_assign) over padded gts;
- per-level means over ALL elements with pos/neg masks as weights
  (mmdet weight_reduce_loss semantics, losses/utils.py:28-53);
- BCE for cls/conf/xy (xy target is the in-cell offset in (0,1)),
  MSE for wh (log-scale), weights cls/conf 1.0, xy/wh 2.0
  (reference configs/yolo/yolov3_d53_mstrain-608_273e_coco.py).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors import YOLOAnchorGenerator
from ...core.assigners import NEGATIVE, grid_assign_batch
from ...core.bbox import YOLOBBoxCoder
from ...core.nms import batched_nms
from ...registry import HEADS
from .. import losses as L
from ..layers import ConvModule

LEAKY = dict(type='LeakyReLU', negative_slope=0.1)

# COCO anchors, deepest level first (reference yolo_head.py:57-63)
V3_BASE_SIZES = (
    ((116, 90), (156, 198), (373, 326)),
    ((30, 61), (62, 45), (59, 119)),
    ((10, 13), (16, 30), (33, 23)),
)


@HEADS.register_module()
class YOLOV3Head(nn.Module):
    num_classes: int
    in_channels: Sequence[int] = (512, 256, 128)
    out_channels: Sequence[int] = (1024, 512, 256)
    base_sizes: Tuple = V3_BASE_SIZES
    featmap_strides: Tuple[int, ...] = (32, 16, 8)
    one_hot_smoother: float = 0.
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    loss_cls_weight: float = 1.0
    loss_conf_weight: float = 1.0
    loss_xy_weight: float = 2.0
    loss_wh_weight: float = 2.0
    # the published yolov3 recipe SUMS loss elements instead of meaning
    # them (configs/yolo/yolov3_d53_mstrain-608_273e_coco.py:25-40:
    # reduction='sum' on all four losses) — 'mean' is the head-default
    # fallback semantics (reference yolo_head.py:72-76)
    loss_reduction: str = 'sum'
    dtype: Any = None

    @property
    def num_levels(self):
        return len(self.featmap_strides)

    @property
    def num_attrib(self):
        return 5 + self.num_classes

    @property
    def anchor_generator(self) -> YOLOAnchorGenerator:
        return YOLOAnchorGenerator(
            strides=list(self.featmap_strides),
            base_sizes=[list(b) for b in self.base_sizes])

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert len(feats) == self.num_levels
        out = []
        for i in range(self.num_levels):
            x = ConvModule(self.out_channels[i], 3, act=LEAKY,
                           dtype=self.dtype,
                           name=f'conv_bridge{i}')(feats[i], train)
            num_anchors = len(self.base_sizes[i])
            x = nn.Conv(num_anchors * self.num_attrib, (1, 1), use_bias=True,
                        dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.01),
                        name=f'conv_pred{i}')(x)
            out.append(x)
        return tuple(out)

    # ------------------------------------------------------------------
    def _responsible_mask(self, gt_bboxes, gt_valid, featmap_size, stride,
                          num_base_anchors):
        """Dense (B, H*W*A) responsibility: anchors in the gt-center cell
        (reference anchor_generator.py:667-727)."""
        feat_h, feat_w = featmap_size
        cx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) * 0.5
        cy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) * 0.5
        gx = jnp.clip((cx / stride).astype(jnp.int32), 0, feat_w - 1)
        gy = jnp.clip((cy / stride).astype(jnp.int32), 0, feat_h - 1)
        cell = gy * feat_w + gx  # (B, G)

        def scatter(cells, valid):
            grid = jnp.zeros(feat_h * feat_w, bool)
            return grid.at[cells].max(valid)

        grid = jax.vmap(scatter)(cell, gt_valid)  # (B, H*W)
        return jnp.repeat(grid, num_base_anchors, axis=-1)

    def loss(self, pred_maps, gt_bboxes, gt_labels, gt_valid) -> Dict:
        gen = self.anchor_generator
        featmap_sizes = [tuple(p.shape[1:3]) for p in pred_maps]
        mlvl_anchors = gen.grid_anchors(featmap_sizes)
        coder = YOLOBBoxCoder()

        # ONE grid assignment over the concatenated multi-level anchors
        # (reference yolo_head.py:424-436 concatenates levels before
        # GridAssigner): the per-gt forced-best anchor is global across
        # levels — a per-level assign would force num_levels positives
        # per gt instead of one.
        counts = [len(a) for a in mlvl_anchors]
        flat_anchors = jnp.asarray(np.concatenate(mlvl_anchors))
        flat_responsible = jnp.concatenate([
            self._responsible_mask(gt_bboxes, gt_valid, featmap_sizes[i],
                                   float(self.featmap_strides[i]),
                                   len(self.base_sizes[i]))
            for i in range(self.num_levels)
        ], axis=-1)
        flat_assigned = grid_assign_batch(flat_anchors, flat_responsible,
                                          gt_bboxes, gt_valid,
                                          self.pos_iou_thr,
                                          self.neg_iou_thr, 0.0)  # (B, A)

        total = dict(loss_cls=0., loss_conf=0., loss_xy=0., loss_wh=0.)
        start = 0
        for lvl in range(self.num_levels):
            pred = pred_maps[lvl].astype(jnp.float32)
            b = pred.shape[0]
            pred = pred.reshape(b, -1, self.num_attrib)
            anchors = jnp.asarray(mlvl_anchors[lvl])
            stride = float(self.featmap_strides[lvl])
            assigned = jax.lax.dynamic_slice_in_dim(
                flat_assigned, start, counts[lvl], axis=1)
            start += counts[lvl]
            pos = (assigned >= 0).astype(jnp.float32)
            neg = (assigned == NEGATIVE).astype(jnp.float32)
            pos_and_neg = jnp.clip(pos + neg, 0., 1.)

            gt_idx = jnp.clip(assigned, 0, None)
            matched = jnp.take_along_axis(gt_bboxes, gt_idx[..., None],
                                          axis=1)
            # avoid log(0) on padded slots: substitute anchors
            matched = jnp.where(pos[..., None] > 0, matched,
                                jnp.broadcast_to(anchors[None],
                                                 matched.shape))
            target_xywh = coder.encode(anchors[None], matched, stride)
            matched_labels = jnp.take_along_axis(gt_labels, gt_idx, axis=1)
            tcls = jax.nn.one_hot(matched_labels, self.num_classes,
                                  dtype=jnp.float32)
            if self.one_hot_smoother != 0:
                tcls = tcls * (1 - self.one_hot_smoother) + \
                    self.one_hot_smoother / self.num_classes

            if self.loss_reduction == 'sum':
                numel_cls = numel_1 = numel_2 = 1.0
            else:
                numel_cls = float(np.prod(
                    (b, pred.shape[1], self.num_classes)))
                numel_1 = float(b * pred.shape[1])
                numel_2 = float(b * pred.shape[1] * 2)
            total['loss_cls'] += L.bce_loss(
                pred[..., 5:], tcls, weight=pos[..., None],
                avg_factor=numel_cls, loss_weight=self.loss_cls_weight)
            total['loss_conf'] += L.bce_loss(
                pred[..., 4], pos, weight=pos_and_neg, avg_factor=numel_1,
                loss_weight=self.loss_conf_weight)
            total['loss_xy'] += L.bce_loss(
                pred[..., :2], target_xywh[..., :2], weight=pos[..., None],
                avg_factor=numel_2, loss_weight=self.loss_xy_weight)
            mse = (pred[..., 2:4] - target_xywh[..., 2:4])**2
            total['loss_wh'] += self.loss_wh_weight * jnp.sum(
                mse * pos[..., None]) / numel_2
        total['num_gts'] = jnp.mean(jnp.sum(gt_valid.astype(jnp.float32),
                                            axis=1))
        return total

    # ------------------------------------------------------------------
    def get_bboxes(self, pred_maps, scale_factors=None,
                   score_thr: float = 0.05, conf_thr: float = 0.005,
                   iou_thr: float = 0.45, max_per_img: int = 100,
                   nms_pre: int = 1000, img_shape=None,
                   with_nms: bool = True, **kwargs):
        """Decode + NMS (reference yolo_head.py get_bboxes: sigmoid xy/conf/
        cls, per-level topk by conf, score = cls * conf with a conf
        threshold zeroing low-confidence candidates)."""
        gen = self.anchor_generator
        featmap_sizes = [tuple(p.shape[1:3]) for p in pred_maps]
        mlvl_anchors = gen.grid_anchors(featmap_sizes)

        boxes_all, scores_all, conf_all = [], [], []
        for lvl, pred in enumerate(pred_maps):
            b = pred.shape[0]
            p = pred.reshape(b, -1, self.num_attrib).astype(jnp.float32)
            xy = jax.nn.sigmoid(p[..., :2])
            wh = p[..., 2:4]
            conf = jax.nn.sigmoid(p[..., 4])
            cls = jax.nn.sigmoid(p[..., 5:])
            anchors = jnp.asarray(mlvl_anchors[lvl])
            decoded = YOLOBBoxCoder.decode(
                anchors[None], jnp.concatenate([xy, wh], axis=-1),
                float(self.featmap_strides[lvl]))
            if not with_nms:
                # raw reference return: no conf masking, no topk, cls
                # sigmoid scores + bg column + conf (yolo_head.py
                # _get_bboxes else-branch 3-tuple)
                boxes_all.append(decoded)
                scores_all.append(cls)
                conf_all.append(conf)
                continue
            conf = jnp.where(conf >= conf_thr, conf, 0.)
            k = min(nms_pre, decoded.shape[1])
            if 0 < k < decoded.shape[1]:
                _, topk = jax.lax.top_k(conf, k)
                decoded = jnp.take_along_axis(decoded, topk[..., None],
                                              axis=1)
                cls = jnp.take_along_axis(cls, topk[..., None], axis=1)
                conf = jnp.take_along_axis(conf, topk, axis=1)
            boxes_all.append(decoded)
            scores_all.append(cls * conf[..., None])

        bbox = jnp.concatenate(boxes_all, axis=1)
        scores = jnp.concatenate(scores_all, axis=1)
        if scale_factors is not None:
            bbox = bbox / scale_factors[:, None, :]
        if not with_nms:
            padding = jnp.zeros(scores.shape[:-1] + (1,), scores.dtype)
            return (bbox, jnp.concatenate([scores, padding], axis=-1),
                    jnp.concatenate(conf_all, axis=1))
        return batched_nms(bbox, scores, score_thr, iou_thr, max_per_img,
                           nms_pre=4096)
