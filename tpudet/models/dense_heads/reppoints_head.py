"""RepPoints head (reference mmdet/models/dense_heads/reppoints_head.py:14).

Point-set representation with two-stage refinement:
- pts_init from a plain conv; the (0.1 gradient_mul) init offsets drive a
  deformable conv for both classification and refinement
  (reppoints_head.py:254-294);
- points -> box via the 'moment' transform (mean ± std * exp(learned
  moment_transfer), moment_mul=0.01, reppoints_head.py:196-213);
- init targets from the PointAssigner (each gt claims its ``pos_num``
  closest same-level points, closer gt wins a contested point,
  point_assigner.py:36-121), refine targets from MaxIoU assignment over
  the detached init boxes (reppoints_head.py:612-637);
- losses: focal cls (refine norm) + smooth-L1 on boxes normalized by
  ``point_base_scale * stride`` for both stages (reppoints_head.py:557-566).

Because the moment transform owns a learned parameter, ``__call__``
returns fully decoded per-level init/refine boxes in image coordinates;
``loss``/``get_bboxes`` stay parameter-free.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.assigners import NEGATIVE, max_iou_assign
from ...core.nms import batched_nms
from ...ops.deform_conv import DeformConv2d
from ...registry import HEADS
from .. import losses as L

INF = 1e8


@HEADS.register_module()
class RepPointsHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    num_points: int = 9
    gradient_mul: float = 0.1
    point_base_scale: int = 4
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    moment_mul: float = 0.01
    # train cfg (reference configs/reppoints)
    init_pos_num: int = 1
    init_assign_scale: int = 4
    refine_pos_iou: float = 0.5
    refine_neg_iou: float = 0.4
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_init_weight: float = 0.5
    loss_refine_weight: float = 1.0
    smooth_l1_beta: float = 0.11
    dtype: Any = None

    @property
    def dcn_kernel(self) -> int:
        return int(np.sqrt(self.num_points))

    def _dcn_base_offset(self) -> np.ndarray:
        """(2*P,) y-first regular grid offsets (reppoints_head.py:103-113)."""
        k = self.dcn_kernel
        pad = (k - 1) // 2
        base = np.arange(-pad, pad + 1).astype(np.float32)
        yy = np.repeat(base, k)
        xx = np.tile(base, k)
        return np.stack([yy, xx], axis=1).reshape(-1)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        prior_bias = float(-math.log((1 - 0.01) / 0.01))
        k = self.dcn_kernel
        base_off = jnp.asarray(self._dcn_base_offset())  # (2P,)
        moment = self.param('moment_transfer', nn.initializers.zeros, (2,))
        moment = (moment * self.moment_mul +
                  jax.lax.stop_gradient(moment) * (1 - self.moment_mul))

        def gn_conv(f, name):
            conv = nn.Conv(f, (3, 3), padding='SAME', use_bias=False,
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name=f'{name}_conv')
            gn = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                              name=f'{name}_gn')

            def run(v, train_):
                return jax.nn.relu(gn(conv(v)))
            return run

        cls_tower = [gn_conv(self.feat_channels, f'cls{i}')
                     for i in range(self.stacked_convs)]
        reg_tower = [gn_conv(self.feat_channels, f'reg{i}')
                     for i in range(self.stacked_convs)]
        pts_init_conv = nn.Conv(self.point_feat_channels, (3, 3),
                                padding='SAME', use_bias=True,
                                dtype=self.dtype,
                                kernel_init=nn.initializers.normal(0.01),
                                name='pts_init_conv')
        pts_init_out = nn.Conv(2 * self.num_points, (1, 1), use_bias=True,
                               dtype=self.dtype,
                               kernel_init=nn.initializers.normal(0.01),
                               name='pts_init_out')
        cls_dcn = DeformConv2d(self.point_feat_channels, k, name='cls_dcn')
        cls_out_conv = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                               dtype=self.dtype,
                               kernel_init=nn.initializers.normal(0.01),
                               bias_init=nn.initializers.constant(prior_bias),
                               name='cls_out')
        refine_dcn = DeformConv2d(self.point_feat_channels, k,
                                  name='refine_dcn')
        refine_out = nn.Conv(2 * self.num_points, (1, 1), use_bias=True,
                             dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name='refine_out')

        def points2bbox(pts):
            """pts (..., 2P) y-first offsets -> (..., 4) moment box."""
            p = pts.reshape(pts.shape[:-1] + (self.num_points, 2))
            py, px = p[..., 0], p[..., 1]
            my = jnp.mean(py, -1, keepdims=True)
            mx = jnp.mean(px, -1, keepdims=True)
            # torch.std is UNBIASED (divisor n-1, reppoints_head.py:200);
            # eps inside the sqrt: at positions where all points coincide
            # (e.g. zeroed activations) torch.std's grad is inf/NaN; the
            # epsilon keeps the moment grad finite with negligible skew
            n1 = float(self.num_points - 1)
            sy = jnp.sqrt(
                jnp.sum((py - my)**2, -1, keepdims=True) / n1 + 1e-12)
            sx = jnp.sqrt(
                jnp.sum((px - mx)**2, -1, keepdims=True) / n1 + 1e-12)
            hw = sx * jnp.exp(moment[0])
            hh = sy * jnp.exp(moment[1])
            return jnp.concatenate([mx - hw, my - hh, mx + hw, my + hh], -1)

        cls_scores, init_boxes, refine_boxes = [], [], []
        for lvl, x in enumerate(feats):
            s = self.strides[lvl]
            b, h, w, _ = x.shape
            c = x
            for conv in cls_tower:
                c = conv(c, train)
            r = x
            for conv in reg_tower:
                r = conv(r, train)
            pts_init = pts_init_out(jax.nn.relu(pts_init_conv(r))).astype(
                jnp.float32)  # (B, H, W, 2P) y-first, in stride units
            pts_gm = ((1 - self.gradient_mul) *
                      jax.lax.stop_gradient(pts_init) +
                      self.gradient_mul * pts_init)
            dcn_off = pts_gm - base_off[None, None, None, :]
            cls_scores.append(
                cls_out_conv(jax.nn.relu(cls_dcn(c, dcn_off))))
            pts_refine = refine_out(
                jax.nn.relu(refine_dcn(r, dcn_off))).astype(jnp.float32)
            pts_refine = pts_refine + jax.lax.stop_gradient(pts_init)

            # decode to image coords: center + box(points)*stride
            cx = (jnp.tile(jnp.arange(w, dtype=jnp.float32), h)) * s
            cy = (jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)) * s
            center = jnp.stack([cx, cy, cx, cy], -1)  # (HW, 4)
            bi = points2bbox(pts_init.reshape(b, h * w, -1)) * s + center
            br = points2bbox(pts_refine.reshape(b, h * w, -1)) * s + center
            init_boxes.append(bi)
            refine_boxes.append(br)
        return tuple(cls_scores), tuple(init_boxes), tuple(refine_boxes)

    # ------------------------------------------------------------------
    def _points(self, featmap_sizes):
        pts, lvl_ids, strides = [], [], []
        for i, (h, w) in enumerate(featmap_sizes):
            s = self.strides[i]
            xs = np.tile(np.arange(w, dtype=np.float32), h) * s
            ys = np.repeat(np.arange(h, dtype=np.float32), w) * s
            pts.append(np.stack([xs, ys], -1))
            lvl_ids.append(np.full(h * w, int(np.log2(s)), np.int32))
            strides.append(np.full(h * w, s, np.float32))
        return (np.concatenate(pts), np.concatenate(lvl_ids),
                np.concatenate(strides))

    def _point_assign(self, points, lvl_ids, gts, valid):
        """Dense PointAssigner: (P,) gt index or NEGATIVE."""
        g_cx = (gts[:, 0] + gts[:, 2]) / 2
        g_cy = (gts[:, 1] + gts[:, 3]) / 2
        g_w = jnp.clip(gts[:, 2] - gts[:, 0], 1e-6, None)
        g_h = jnp.clip(gts[:, 3] - gts[:, 1], 1e-6, None)
        lvl_min = int(np.log2(self.strides[0]))
        lvl_max = int(np.log2(self.strides[-1]))
        scale = self.init_assign_scale
        g_lvl = jnp.clip(jnp.floor(
            (jnp.log2(g_w / scale) + jnp.log2(g_h / scale)) / 2.),
            lvl_min, lvl_max).astype(jnp.int32)

        dist = jnp.sqrt(((points[:, 0, None] - g_cx[None]) / g_w[None])**2 +
                        ((points[:, 1, None] - g_cy[None]) / g_h[None])**2)
        same_lvl = lvl_ids[:, None] == g_lvl[None, :]
        dist = jnp.where(same_lvl & valid[None, :], dist, INF)  # (P, G)
        # per gt: pos_num closest points
        kk = self.init_pos_num
        _, topk = jax.lax.top_k(-dist.T, kk)  # (G, kk)
        cand = jnp.zeros(dist.shape, bool).at[
            topk, jnp.arange(gts.shape[0])[:, None]].set(True)
        cand = cand & (dist < INF)
        # each point -> closest candidate gt (first wins ties, like the
        # reference's strict-less overwrite)
        d = jnp.where(cand, dist, INF)
        best = jnp.argmin(d, axis=1).astype(jnp.int32)
        return jnp.where(jnp.any(cand, axis=1), best, NEGATIVE)

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        cls_scores, init_boxes, refine_boxes = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        pts_np, lvl_np, stride_np = self._points(featmap_sizes)
        points = jnp.asarray(pts_np)
        lvl_ids = jnp.asarray(lvl_np)
        strides = jnp.asarray(stride_np)
        b = cls_scores[0].shape[0]
        C = self.num_classes

        cls_flat = jnp.concatenate([
            c.reshape(b, -1, C).astype(jnp.float32) for c in cls_scores
        ], axis=1)
        bi_flat = jnp.concatenate(init_boxes, axis=1)
        br_flat = jnp.concatenate(refine_boxes, axis=1)
        norm = (self.point_base_scale * strides)[None, :, None]

        def assign_one(gts, valid, init_b):
            a_init = self._point_assign(points, lvl_ids, gts, valid)
            a_refine = max_iou_assign(jax.lax.stop_gradient(init_b), gts,
                                      valid, self.refine_pos_iou,
                                      self.refine_neg_iou, 0.0, True)
            return a_init, a_refine

        a_init, a_refine = jax.vmap(assign_one)(gt_bboxes, gt_valid, bi_flat)

        def stage_loss(assigned, box_pred, weight):
            pos = assigned >= 0
            num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
            gt_idx = jnp.clip(assigned, 0, None)
            tgt = jnp.take_along_axis(gt_bboxes, gt_idx[..., None], axis=1)
            tgt = jnp.where(pos[..., None], tgt, box_pred)
            return L.smooth_l1_loss(
                box_pred / norm, tgt / norm, beta=self.smooth_l1_beta,
                weight=pos[..., None].astype(jnp.float32),
                avg_factor=num_pos, loss_weight=weight), num_pos

        loss_init, _ = stage_loss(a_init, bi_flat, self.loss_init_weight)
        loss_refine, num_pos_r = stage_loss(a_refine, br_flat,
                                            self.loss_refine_weight)

        pos_r = a_refine >= 0
        neg_r = a_refine == NEGATIVE
        lab = jnp.take_along_axis(gt_labels, jnp.clip(a_refine, 0, None),
                                  axis=1)
        onehot = jax.nn.one_hot(lab, C) * pos_r[..., None]
        loss_cls = L.sigmoid_focal_loss(
            cls_flat, onehot, gamma=self.focal_gamma, alpha=self.focal_alpha,
            weight=(pos_r | neg_r)[..., None].astype(jnp.float32),
            avg_factor=num_pos_r)
        return dict(loss_cls=loss_cls, loss_pts_init=loss_init,
                    loss_pts_refine=loss_refine,
                    num_gts=jnp.mean(jnp.sum(gt_valid.astype(jnp.float32),
                                             axis=1)))

    # ------------------------------------------------------------------
    def get_bboxes(self, preds, scale_factors=None, score_thr: float = 0.05,
                   iou_thr: float = 0.5, max_per_img: int = 100,
                   nms_pre: int = 1000, img_shape=None,
                   with_nms: bool = True, **kwargs):
        """NMS over the refined boxes (reference reppoints_head.py
        _get_bboxes: corners clamped to ``img_shape``)."""
        cls_scores, _, refine_boxes = preds
        b = cls_scores[0].shape[0]
        boxes_all, scores_all = [], []
        for lvl in range(len(cls_scores)):
            scores = jax.nn.sigmoid(
                cls_scores[lvl].reshape(b, -1, self.num_classes).astype(
                    jnp.float32))
            boxes = refine_boxes[lvl]
            if img_shape is not None:
                boxes = jnp.stack([
                    jnp.clip(boxes[..., 0], 0, img_shape[1]),
                    jnp.clip(boxes[..., 1], 0, img_shape[0]),
                    jnp.clip(boxes[..., 2], 0, img_shape[1]),
                    jnp.clip(boxes[..., 3], 0, img_shape[0])], axis=-1)
            k = min(nms_pre, scores.shape[1]) if with_nms else 0
            if 0 < k < scores.shape[1]:
                max_s = jnp.max(scores, axis=-1)
                _, topk = jax.lax.top_k(max_s, k)
                scores = jnp.take_along_axis(scores, topk[..., None], axis=1)
                boxes = jnp.take_along_axis(boxes, topk[..., None], axis=1)
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
