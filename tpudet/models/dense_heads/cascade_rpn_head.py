"""Cascade RPN (reference mmdet/models/dense_heads/cascade_rpn_head.py,
configs/cascade_rpn/crpn_r50_caffe_fpn_1x_coco.py).

Two RPN stages progressively refine one square anchor per cell:
- stage 0: dilated-3 "adaptive" conv, no cls branch, RegionAssigner
  targets (center/ignore regions on the gt's scale-assigned level, like
  guided anchoring's loc maps), linear IoU loss (w=10) on decoded boxes,
  bridged feature (the stage's post-conv feature feeds stage 1);
- stage 1: deformable adaptive conv whose offsets are computed
  ANALYTICALLY from the refined anchors (center offset + shape-scaled
  kernel offsets, cascade_rpn_head.py:326-403), BCE objectness under
  MaxIoU(0.7/0.7/0.3) + linear IoU loss;
- proposals: decode stage-1 deltas on the refined anchors, level-aware
  NMS at IoU 0.8.

Shape-static: refined anchors are recomputed from stage-0 predictions in
the pure loss/get_proposals paths (same decode, stop-gradient), so the
head's __call__ can return plain per-stage prediction maps.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors import AnchorGenerator
from ...core.assigners import NEGATIVE, max_iou_assign
from ...core.bbox import DeltaXYWHBBoxCoder
from ...core.nms import nms_padded
from ...ops.deform_conv import DeformConv2d
from ...registry import HEADS
from .. import losses as L

STAGE0_STDS = (0.1, 0.1, 0.5, 0.5)
STAGE1_STDS = (0.05, 0.05, 0.1, 0.1)


def anchor_offsets(anchors, stride, featmap_size, k: int = 3):
    """Analytic deform offsets from per-cell anchors
    (cascade_rpn_head.py:326-403): center offset (anchor center vs cell)
    plus shape offsets (anchor w/h scaled kernel taps), (y, x) per tap.

    anchors (B, H*W, 4) -> (B, H, W, 2*k*k)."""
    h, w = featmap_size
    pad = (k - 1) // 2
    idx = jnp.arange(-pad, pad + 1, dtype=jnp.float32)
    yy = jnp.repeat(idx, k)  # (k*k,)
    xx = jnp.tile(idx, k)

    aw = (anchors[..., 2] - anchors[..., 0]) / stride
    ah = (anchors[..., 3] - anchors[..., 1]) / stride
    sx = (aw / (k - 1) - 1.0)[..., None] * xx  # (B, P, k*k)
    sy = (ah / (k - 1) - 1.0)[..., None] * yy

    cx = (anchors[..., 0] + anchors[..., 2]) * 0.5 / stride
    cy = (anchors[..., 1] + anchors[..., 3]) * 0.5 / stride
    gx = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)
    gy = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)
    ox = sx + (cx - gx[None])[..., None]
    oy = sy + (cy - gy[None])[..., None]
    off = jnp.stack([oy, ox], axis=-1)  # (B, P, k*k, 2)
    return off.reshape(anchors.shape[0], h, w, 2 * k * k)


class StageCascadeRPN(nn.Module):
    feat_channels: int = 256
    adapt_type: str = 'dilation'  # 'dilation' | 'offset'
    dilation: int = 3
    with_cls: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, offsets=None):
        """feats: per-level (B,H,W,C); offsets: per-level (B,H,W,18) when
        adapt_type == 'offset'. Returns (bridged, cls, reg) per level."""
        if self.adapt_type == 'offset':
            adapt = DeformConv2d(self.feat_channels, kernel_size=3,
                                 dtype=self.dtype, name='rpn_conv')
        else:
            d = self.dilation
            adapt = nn.Conv(self.feat_channels, (3, 3), padding=[(d, d),
                                                                 (d, d)],
                            kernel_dilation=(d, d), use_bias=False,
                            dtype=self.dtype,
                            kernel_init=nn.initializers.normal(0.01),
                            name='rpn_conv')
        rpn_cls = (nn.Conv(1, (1, 1), dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='rpn_cls') if self.with_cls else None)
        rpn_reg = nn.Conv(4, (1, 1), dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          name='rpn_reg')
        bridged, cls_out, reg_out = [], [], []
        for lvl, feat in enumerate(feats):
            if self.adapt_type == 'offset':
                x = jax.nn.relu(adapt(feat, offsets[lvl]))
            else:
                x = jax.nn.relu(adapt(feat))
            bridged.append(x)
            cls_out.append(rpn_cls(x) if rpn_cls is not None else None)
            reg_out.append(rpn_reg(x))
        return bridged, tuple(cls_out), tuple(reg_out)


@HEADS.register_module()
class CascadeRPNHead(nn.Module):
    in_channels: int = 256
    feat_channels: int = 256
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    anchor_scale: int = 8
    # region assigner (stage 0)
    center_ratio: float = 0.2
    ignore_ratio: float = 0.5
    # stage 1 MaxIoU
    pos_iou_thr: float = 0.7
    neg_iou_thr: float = 0.7
    min_pos_iou: float = 0.3
    num_samples: int = 256
    loss_bbox_weight: float = 10.0
    dtype: Any = None

    @property
    def anchor_generator(self) -> AnchorGenerator:
        return AnchorGenerator(strides=list(self.strides), ratios=[1.0],
                               scales=[self.anchor_scale])

    def setup(self):
        self.stage0 = StageCascadeRPN(
            feat_channels=self.feat_channels, adapt_type='dilation',
            with_cls=False, dtype=self.dtype)
        self.stage1 = StageCascadeRPN(
            feat_channels=self.feat_channels, adapt_type='offset',
            with_cls=True, dtype=self.dtype)

    # ------------------------------------------------------------------
    def _grid(self, featmap_sizes):
        return [np.asarray(a)
                for a in self.anchor_generator.grid_anchors(featmap_sizes)]

    def _coder(self, stds):
        return DeltaXYWHBBoxCoder(target_stds=stds)

    def _refine(self, anchors, reg, img_shape=None):
        boxes = self._coder(STAGE0_STDS).decode(
            anchors, reg.astype(jnp.float32), max_shape=img_shape)
        return jax.lax.stop_gradient(boxes)

    def __call__(self, feats, train: bool = False):
        """Returns (stage0 reg maps, stage1 cls maps, stage1 reg maps)."""
        featmap_sizes = [tuple(f.shape[1:3]) for f in feats]
        b = feats[0].shape[0]
        x, _, reg0 = self.stage0(feats)
        # refined anchors per level -> analytic offsets for stage 1
        grids = self._grid(featmap_sizes)
        offsets = []
        for lvl, size in enumerate(featmap_sizes):
            anchors = jnp.asarray(grids[lvl])
            anchors = jnp.broadcast_to(anchors[None],
                                       (b,) + anchors.shape)
            refined = self._refine(
                anchors, reg0[lvl].reshape(b, -1, 4))
            offsets.append(anchor_offsets(refined, self.strides[lvl],
                                          size))
        _, cls1, reg1 = self.stage1(x, offsets)
        return reg0, cls1, reg1

    # ------------------------------------------------------------------
    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        reg0, cls1, reg1 = preds
        featmap_sizes = [tuple(r.shape[1:3]) for r in reg0]
        grids = self._grid(featmap_sizes)
        anchors0 = jnp.asarray(np.concatenate(grids))  # (A, 4)
        b = reg0[0].shape[0]
        flat = lambda t, d: jnp.concatenate(  # noqa: E731
            [x.reshape(b, -1, d).astype(jnp.float32) for x in t], axis=1)
        reg0_f = flat(reg0, 4)
        cls1_f = flat(cls1, 1)[..., 0]
        reg1_f = flat(reg1, 4)

        # ---- stage 0: region assignment (dense, like GA loc targets)
        num_lvls = len(featmap_sizes)
        scale = jnp.sqrt(jnp.maximum(
            (gt_bboxes[..., 2] - gt_bboxes[..., 0]) *
            (gt_bboxes[..., 3] - gt_bboxes[..., 1]), 1e-6))
        min_size = float(self.anchor_scale * self.strides[0])
        tgt_lvl = jnp.clip(jnp.floor(
            jnp.log2(scale) - math.log2(min_size) + 0.5), 0,
            num_lvls - 1).astype(jnp.int32)
        r1 = (1 - self.center_ratio) / 2
        r2 = (1 - self.ignore_ratio) / 2

        pos_gt_parts = []
        for lvl in range(num_lvls):
            h, w = featmap_sizes[lvl]
            stride = self.strides[lvl]
            g = gt_bboxes / stride
            xs = jnp.arange(w, dtype=jnp.float32)
            ys = jnp.arange(h, dtype=jnp.float32)

            def region(ratio):
                x1 = jnp.clip(jnp.round((1 - ratio) * g[..., 0] +
                                        ratio * g[..., 2]), 0, w - 1)
                y1 = jnp.clip(jnp.round((1 - ratio) * g[..., 1] +
                                        ratio * g[..., 3]), 0, h - 1)
                x2 = jnp.clip(jnp.round(ratio * g[..., 0] +
                                        (1 - ratio) * g[..., 2]), 0, w - 1)
                y2 = jnp.clip(jnp.round(ratio * g[..., 1] +
                                        (1 - ratio) * g[..., 3]), 0, h - 1)
                in_x = (xs[None, None] >= x1[..., None]) & \
                    (xs[None, None] <= x2[..., None])
                in_y = (ys[None, None] >= y1[..., None]) & \
                    (ys[None, None] <= y2[..., None])
                return in_y[..., :, None] & in_x[..., None, :]  # (B,G,H,W)

            own = gt_valid & (tgt_lvl == lvl)
            center = region(r1) & own[..., None, None]
            # (the reference RegionAssigner's r2 ignore regions only
            # matter for a cls branch; stage 0 is reg-only, so they are
            # not computed here)
            # per-cell matched gt: highest gt index whose center region
            # covers the cell (reference sequential overwrite order)
            gidx = jnp.arange(center.shape[1], dtype=jnp.int32)
            claim = jnp.max(jnp.where(center, gidx[None, :, None, None],
                                      -1), axis=1)  # (B, H, W)
            pos_gt_parts.append(claim.reshape(b, -1))
        pos_gt = jnp.concatenate(pos_gt_parts, axis=1)  # (B, A)
        pos0 = pos_gt >= 0
        num_pos0 = jnp.maximum(jnp.sum(pos0.astype(jnp.float32)), 1.0)
        matched0 = jnp.take_along_axis(
            gt_bboxes, jnp.clip(pos_gt, 0, None)[..., None], axis=1)
        decoded0 = self._coder(STAGE0_STDS).decode(anchors0[None], reg0_f)
        loss_reg0 = L.iou_loss(
            decoded0, jnp.where(pos0[..., None], matched0, decoded0),
            weight=pos0.astype(jnp.float32), avg_factor=num_pos0,
            loss_weight=self.loss_bbox_weight, linear=True)

        # ---- stage 1: MaxIoU on refined anchors
        refined = jax.lax.stop_gradient(
            self._coder(STAGE0_STDS).decode(anchors0[None], reg0_f))
        assigned = jax.vmap(
            lambda a, g, gv: max_iou_assign(
                a, g, gv, self.pos_iou_thr, self.neg_iou_thr,
                self.min_pos_iou, True))(refined, gt_bboxes, gt_valid)
        pos1 = assigned >= 0
        neg1 = assigned == NEGATIVE
        # static 1:1 sampling cap (RandomSampler num=256)
        priority = jnp.asarray(
            np.random.RandomState(7).rand(pos1.shape[1]).astype(np.float32))
        half = self.num_samples // 2
        p_rank = jnp.argsort(jnp.argsort(
            jnp.where(pos1, priority[None], 2.0), axis=1), axis=1)
        pos_k = pos1 & (p_rank < half)
        n_pos = jnp.sum(pos_k, axis=1, keepdims=True)
        n_rank = jnp.argsort(jnp.argsort(
            jnp.where(neg1, priority[None], 2.0), axis=1), axis=1)
        neg_k = neg1 & (n_rank < self.num_samples - n_pos)
        sampled = pos_k | neg_k
        num_total = jnp.maximum(jnp.sum(sampled.astype(jnp.float32)), 1.0)
        bce = L.binary_cross_entropy_with_logits(
            cls1_f, pos_k.astype(jnp.float32))
        loss_cls1 = jnp.sum(bce * sampled) / num_total

        matched1 = jnp.take_along_axis(
            gt_bboxes, jnp.clip(assigned, 0, None)[..., None], axis=1)
        decoded1 = self._coder(STAGE1_STDS).decode(refined, reg1_f)
        num_pos1 = jnp.maximum(jnp.sum(pos_k.astype(jnp.float32)), 1.0)
        loss_reg1 = L.iou_loss(
            decoded1, jnp.where(pos_k[..., None], matched1, decoded1),
            weight=pos_k.astype(jnp.float32), avg_factor=num_pos1,
            loss_weight=self.loss_bbox_weight, linear=True)
        return dict(loss_rpn_reg_s0=loss_reg0, loss_rpn_cls=loss_cls1,
                    loss_rpn_bbox=loss_reg1)

    # ------------------------------------------------------------------
    def get_proposals(self, preds, img_shape=None, nms_pre: int = 2000,
                      max_num: int = 300, iou_thr: float = 0.8,
                      min_bbox_size: float = 0.):
        reg0, cls1, reg1 = preds
        featmap_sizes = [tuple(r.shape[1:3]) for r in reg0]
        grids = self._grid(featmap_sizes)
        b = reg0[0].shape[0]

        boxes_all, scores_all, level_all = [], [], []
        for lvl in range(len(reg0)):
            anchors = jnp.asarray(grids[lvl])
            anchors = jnp.broadcast_to(anchors[None], (b,) + anchors.shape)
            refined = self._refine(
                anchors, reg0[lvl].reshape(b, -1, 4), img_shape)
            scores = jax.nn.sigmoid(
                cls1[lvl].reshape(b, -1).astype(jnp.float32))
            deltas = reg1[lvl].reshape(b, -1, 4).astype(jnp.float32)
            k = min(nms_pre, scores.shape[1])
            if 0 < k < scores.shape[1]:
                scores, topk = jax.lax.top_k(scores, k)
                deltas = jnp.take_along_axis(deltas, topk[..., None],
                                             axis=1)
                refined = jnp.take_along_axis(refined, topk[..., None],
                                              axis=1)
            boxes = self._coder(STAGE1_STDS).decode(refined, deltas,
                                                    max_shape=img_shape)
            boxes_all.append(boxes)
            scores_all.append(scores)
            level_all.append(jnp.full(scores.shape, lvl, jnp.float32))

        boxes = jnp.concatenate(boxes_all, axis=1)
        scores = jnp.concatenate(scores_all, axis=1)
        levels = jnp.concatenate(level_all, axis=1)
        w = boxes[..., 2] - boxes[..., 0]
        h = boxes[..., 3] - boxes[..., 1]
        valid = (w > min_bbox_size) & (h > min_bbox_size)
        max_coord = jnp.max(jnp.where(valid[..., None], boxes, 0.))
        offset_boxes = boxes + (levels * (max_coord + 1.))[..., None]

        def one(ob, s, v, bx):
            keep_idx, keep_valid = nms_padded(ob, s, iou_thr, max_num, v)
            return (jnp.where(keep_valid[:, None], bx[keep_idx], 0.),
                    jnp.where(keep_valid, s[keep_idx], 0.), keep_valid)

        return jax.vmap(one)(offset_boxes, scores, valid, boxes)
