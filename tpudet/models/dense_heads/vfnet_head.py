"""VarifocalNet head (reference mmdet/models/dense_heads/vfnet_head.py:19).

IoU-aware dense head with star-shaped deformable refinement:
- initial ltrb distances = exp(scale * conv) * reg_denom (vfnet_head:244-252);
- the 9 star taps sit on the initial box's corners/edges — the dcn offset
  table at vfnet_head.py:273-313, gradient_mul 0.1;
- refined distances multiply the detached initial ones (vfnet_head:262-266);
- varifocal classification on IoU-of-refined-box soft targets, GIoU on
  both stages weighted by each stage's IoU (vfnet_head.py:395-449);
- ATSS assignment over implicit 8x-stride anchors (get_atss_targets).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors import AnchorGenerator
from ...core.assigners import atss_assign
from ...core.bbox import bbox_overlaps_aligned
from ...core.nms import batched_nms
from ...ops.deform_conv import DeformConv2d
from ...registry import HEADS
from .. import losses as L

INF = 1e8


@HEADS.register_module()
class VFNetHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 3
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    regress_ranges: Tuple = ((-1, 64), (64, 128), (128, 256), (256, 512),
                             (512, INF))
    gradient_mul: float = 0.1
    atss_topk: int = 9
    anchor_scale: int = 8
    vfl_alpha: float = 0.75
    vfl_gamma: float = 2.0
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.5
    loss_refine_weight: float = 2.0
    dtype: Any = None

    @property
    def reg_denoms(self):
        d = [r[1] for r in self.regress_ranges[:-1]]
        d.append(d[-1] * 2)
        return d

    @staticmethod
    def _star_base_offset() -> np.ndarray:
        base = np.array([-1, 0, 1], np.float32)
        yy = np.repeat(base, 3)
        xx = np.tile(base, 3)
        return np.stack([yy, xx], 1).reshape(-1)  # (18,) y-first

    @nn.compact
    def __call__(self, feats, train: bool = False):
        prior_bias = float(-math.log((1 - 0.01) / 0.01))
        base_off = jnp.asarray(self._star_base_offset())

        def gn_conv(f, name):
            conv = nn.Conv(f, (3, 3), padding='SAME', use_bias=False,
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name=f'{name}_conv')
            gn = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                              name=f'{name}_gn')
            return lambda v: jax.nn.relu(gn(conv(v)))

        cls_tower = [gn_conv(self.feat_channels, f'cls{i}')
                     for i in range(self.stacked_convs)]
        reg_tower = [gn_conv(self.feat_channels, f'reg{i}')
                     for i in range(self.stacked_convs)]
        reg_conv = gn_conv(self.feat_channels, 'vfnet_reg_conv')
        vfnet_reg = nn.Conv(4, (3, 3), padding='SAME', use_bias=True,
                            dtype=self.dtype,
                            kernel_init=nn.initializers.normal(0.01),
                            name='vfnet_reg')
        refine_dcn = DeformConv2d(self.feat_channels, 3, name='refine_dcn')
        vfnet_reg_refine = nn.Conv(4, (3, 3), padding='SAME', use_bias=True,
                                   dtype=self.dtype,
                                   kernel_init=nn.initializers.normal(0.01),
                                   name='vfnet_reg_refine')
        cls_dcn = DeformConv2d(self.feat_channels, 3, name='cls_dcn')
        vfnet_cls = nn.Conv(self.num_classes, (3, 3), padding='SAME',
                            use_bias=True, dtype=self.dtype,
                            kernel_init=nn.initializers.normal(0.01),
                            bias_init=nn.initializers.constant(prior_bias),
                            name='vfnet_cls')
        scales = self.param('scales', nn.initializers.ones,
                            (len(self.strides),))
        scales_refine = self.param('scales_refine', nn.initializers.ones,
                                   (len(self.strides),))

        cls_out, reg_out, reg_refine_out = [], [], []
        for lvl, x in enumerate(feats):
            s = self.strides[lvl]
            c = x
            for conv in cls_tower:
                c = conv(c)
            r = x
            for conv in reg_tower:
                r = conv(r)
            ri = reg_conv(r)
            bbox_pred = jnp.exp(
                vfnet_reg(ri).astype(jnp.float32) * scales[lvl]
            ) * self.reg_denoms[lvl]  # (B,H,W,4) ltrb px

            gm = ((1 - self.gradient_mul) * jax.lax.stop_gradient(bbox_pred)
                  + self.gradient_mul * bbox_pred) / s
            l_, t_, r_, b_ = gm[..., 0], gm[..., 1], gm[..., 2], gm[..., 3]
            z = jnp.zeros_like(l_)
            # taps on the star (y-first pairs), vfnet_head.py:292-310
            star = jnp.stack([
                -t_, -l_, -t_, z, -t_, r_,
                z, -l_, z, z, z, r_,
                b_, -l_, b_, z, b_, r_
            ], axis=-1)
            dcn_off = star - base_off

            rr = jax.nn.relu(refine_dcn(r, dcn_off))
            refine = jnp.exp(
                vfnet_reg_refine(rr).astype(jnp.float32) *
                scales_refine[lvl]) * jax.lax.stop_gradient(bbox_pred)

            cc = jax.nn.relu(cls_dcn(c, dcn_off))
            cls_out.append(vfnet_cls(cc))
            reg_out.append(bbox_pred)
            reg_refine_out.append(refine)
        return tuple(cls_out), tuple(reg_out), tuple(reg_refine_out)

    # ------------------------------------------------------------------
    def _points_and_anchors(self, featmap_sizes):
        pts, anchors, counts = [], [], []
        for i, (h, w) in enumerate(featmap_sizes):
            s = self.strides[i]
            # reference VFNet anchors/points use center_offset=0.0
            # (vfnet_r50_fpn_1x_coco.py anchor_generator, _get_points_single
            # stride * anchor_center_offset) — points sit at x*stride
            xs = np.tile(np.arange(w, dtype=np.float32), h) * s
            ys = np.repeat(np.arange(h, dtype=np.float32), w) * s
            pts.append(np.stack([xs, ys], -1))
            half = self.anchor_scale * s / 2
            anchors.append(np.stack([xs - half, ys - half, xs + half,
                                     ys + half], -1))
            counts.append(h * w)
        return np.concatenate(pts), np.concatenate(anchors), counts

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        cls_scores, bbox_preds, bbox_refine = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        pts_np, anchors_np, counts = self._points_and_anchors(featmap_sizes)
        points = jnp.asarray(pts_np)
        anchors = jnp.asarray(anchors_np)
        b = cls_scores[0].shape[0]
        C = self.num_classes

        cls_flat = jnp.concatenate([
            c.reshape(b, -1, C).astype(jnp.float32) for c in cls_scores
        ], axis=1)
        init_flat = jnp.concatenate([
            r.reshape(b, -1, 4) for r in bbox_preds], axis=1)
        refine_flat = jnp.concatenate([
            r.reshape(b, -1, 4) for r in bbox_refine], axis=1)

        def decode(ltrb):
            x1 = points[None, :, 0] - ltrb[..., 0]
            y1 = points[None, :, 1] - ltrb[..., 1]
            x2 = points[None, :, 0] + ltrb[..., 2]
            y2 = points[None, :, 1] + ltrb[..., 3]
            return jnp.stack([x1, y1, x2, y2], -1)

        assigned = jax.vmap(
            lambda g, v: atss_assign(anchors, counts, g, v, self.atss_topk)
        )(gt_bboxes, gt_valid)  # (B, P)
        pos = assigned >= 0
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        gt_idx = jnp.clip(assigned, 0, None)
        tgt_boxes = jnp.take_along_axis(gt_bboxes, gt_idx[..., None], axis=1)

        init_boxes = decode(init_flat)
        refine_boxes = decode(refine_flat)
        tgt_safe = jnp.where(pos[..., None], tgt_boxes, init_boxes)

        iou_ini = jnp.clip(bbox_overlaps_aligned(init_boxes, tgt_safe),
                           1e-6, None) * pos
        iou_rf = jnp.clip(bbox_overlaps_aligned(refine_boxes, tgt_safe),
                          1e-6, None) * pos
        w_ini = jax.lax.stop_gradient(iou_ini)
        w_rf = jax.lax.stop_gradient(iou_rf)

        loss_bbox = L.giou_loss(
            init_boxes, jax.lax.stop_gradient(tgt_safe), weight=w_ini,
            avg_factor=jnp.maximum(jnp.sum(w_ini), 1.0),
            loss_weight=self.loss_bbox_weight)
        loss_refine = L.giou_loss(
            refine_boxes, jax.lax.stop_gradient(tgt_safe), weight=w_rf,
            avg_factor=jnp.maximum(jnp.sum(w_rf), 1.0),
            loss_weight=self.loss_refine_weight)

        # varifocal targets: refined IoU at the gt label position
        lab = jnp.take_along_axis(gt_labels, gt_idx, axis=1)
        cls_tgt = jax.nn.one_hot(lab, C) * w_rf[..., None]
        loss_cls = L.varifocal_loss(
            cls_flat, cls_tgt, alpha=self.vfl_alpha, gamma=self.vfl_gamma,
            avg_factor=num_pos, loss_weight=self.loss_cls_weight)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_bbox_rf=loss_refine,
                    num_gts=jnp.mean(jnp.sum(gt_valid.astype(jnp.float32),
                                             axis=1)))

    # ------------------------------------------------------------------
    def get_bboxes(self, preds, scale_factors=None, score_thr: float = 0.05,
                   iou_thr: float = 0.6, max_per_img: int = 100,
                   nms_pre: int = 1000, img_shape=None,
                   with_nms: bool = True, **kwargs):
        """Decode + NMS (reference vfnet_head.py::_get_bboxes_single:
        top-k by the IoU-aware score, refined-branch distance decode
        clipped to ``img_shape``)."""
        cls_scores, _, bbox_refine = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        b = cls_scores[0].shape[0]
        boxes_all, scores_all = [], []
        start = 0
        for lvl in range(len(cls_scores)):
            h, w = featmap_sizes[lvl]
            s = self.strides[lvl]
            # center_offset=0.0 points (see _points_and_anchors)
            xs = jnp.tile(jnp.arange(w, dtype=jnp.float32), h) * s
            ys = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w) * s
            scores = jax.nn.sigmoid(
                cls_scores[lvl].reshape(b, -1, self.num_classes).astype(
                    jnp.float32))
            ltrb = bbox_refine[lvl].reshape(b, -1, 4)
            k = min(nms_pre, scores.shape[1]) if with_nms else 0
            if 0 < k < scores.shape[1]:
                max_s = jnp.max(scores, axis=-1)
                _, topk = jax.lax.top_k(max_s, k)
                scores = jnp.take_along_axis(scores, topk[..., None], axis=1)
                ltrb = jnp.take_along_axis(ltrb, topk[..., None], axis=1)
                xs = xs[topk]
                ys = ys[topk]
            else:
                xs = jnp.broadcast_to(xs[None], (b,) + xs.shape)
                ys = jnp.broadcast_to(ys[None], (b,) + ys.shape)
            x1, y1 = xs - ltrb[..., 0], ys - ltrb[..., 1]
            x2, y2 = xs + ltrb[..., 2], ys + ltrb[..., 3]
            if img_shape is not None:  # distance2bbox max_shape clip
                x1 = jnp.clip(x1, 0, img_shape[1])
                y1 = jnp.clip(y1, 0, img_shape[0])
                x2 = jnp.clip(x2, 0, img_shape[1])
                y2 = jnp.clip(y2, 0, img_shape[0])
            boxes = jnp.stack([x1, y1, x2, y2], -1)
            boxes_all.append(boxes)
            scores_all.append(scores)
        bbox = jnp.concatenate(boxes_all, axis=1)
        scores = jnp.concatenate(scores_all, axis=1)
        if scale_factors is not None:
            bbox = bbox / scale_factors[:, None, :]
        if not with_nms:
            return bbox, scores
        return batched_nms(bbox, scores, score_thr, iou_thr, max_per_img,
                           nms_pre=2048)
