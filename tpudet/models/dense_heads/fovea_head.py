"""FoveaBox head (reference mmdet/models/dense_heads/fovea_head.py:46).

Shape-static rebuild. Per level, a gt whose sqrt-area falls in the level's
scale range paints its sigma-shrunk center region with its label; the
reference paints gts in descending-area order so smaller gts overwrite
(fovea_head.py:228-230) — reproduced densely by per-cell argmin over
covering gt areas (exact-area ties resolve to the lowest gt index instead
of the reference's paint order). Regression targets are
log((stride*pt - gt_side)/base_len) clamped to [1/16, 16]
(fovea_head.py:250-262); losses are focal (avg = num_pos + num_imgs,
fovea_head.py:165) and smooth-L1 beta=0.11 on positives.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.nms import batched_nms
from ...registry import HEADS
from .. import losses as L

INF = 1e8


@HEADS.register_module()
class FoveaHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    base_edge_list: Tuple[int, ...] = (16, 32, 64, 128, 256)
    scale_ranges: Tuple = ((8, 32), (16, 64), (32, 128), (64, 256),
                           (128, 512))
    sigma: float = 0.4
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    smooth_l1_beta: float = 0.11
    loss_bbox_weight: float = 1.0
    dtype: Any = None

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

        cls_tower = tower('cls')
        reg_tower = tower('reg')
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding='SAME',
                           use_bias=True, dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(prior_bias),
                           name='conv_cls')
        conv_reg = nn.Conv(4, (3, 3), padding='SAME', use_bias=True,
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_reg')
        cls_out, reg_out = [], []
        for feat in feats:
            c = feat
            for conv in cls_tower:
                c = jax.nn.relu(conv(c))
            r = feat
            for conv in reg_tower:
                r = jax.nn.relu(conv(r))
            cls_out.append(conv_cls(c))
            reg_out.append(conv_reg(r))
        return tuple(cls_out), tuple(reg_out)

    # ------------------------------------------------------------------
    def _level_targets(self, lvl, featmap_size, gts, labels, valid):
        """Single image, single level. Returns (H*W,) labels with
        num_classes as bg, (H*W, 4) log-space targets, (H*W,) pos mask."""
        s = self.strides[lvl]
        base = self.base_edge_list[lvl]
        lo, hi = self.scale_ranges[lvl]
        h, w = featmap_size

        area = jnp.sqrt(jnp.clip(
            (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1]), 0., None))
        hit = (area >= lo) & (area <= hi) & valid  # (G,)

        gs = gts / s
        half_w = 0.5 * (gs[:, 2] - gs[:, 0])
        half_h = 0.5 * (gs[:, 3] - gs[:, 1])
        left = jnp.clip(jnp.ceil(gs[:, 0] + (1 - self.sigma) * half_w - 0.5),
                        0, w - 1)
        right = jnp.clip(
            jnp.floor(gs[:, 0] + (1 + self.sigma) * half_w - 0.5), 0, w - 1)
        top = jnp.clip(jnp.ceil(gs[:, 1] + (1 - self.sigma) * half_h - 0.5),
                       0, h - 1)
        down = jnp.clip(
            jnp.floor(gs[:, 1] + (1 + self.sigma) * half_h - 0.5), 0, h - 1)

        cx = jnp.arange(w, dtype=jnp.float32)
        cy = jnp.arange(h, dtype=jnp.float32)
        in_x = (cx[None, :] >= left[:, None]) & (cx[None, :] <=
                                                 right[:, None])  # (G, W)
        in_y = (cy[None, :] >= top[:, None]) & (cy[None, :] <=
                                                down[:, None])  # (G, H)
        cover = in_y[:, :, None] & in_x[:, None, :] & hit[:, None, None]
        cover = cover.reshape(cover.shape[0], -1)  # (G, P)

        key = jnp.where(cover, area[:, None], INF)
        winner = jnp.argmin(key, axis=0).astype(jnp.int32)  # (P,)
        pos = jnp.any(cover, axis=0)

        out_labels = jnp.where(pos, jnp.take(labels, winner),
                               self.num_classes)

        # points at (col + 0.5) * stride (fovea _get_points_single +0.5)
        px = (jnp.tile(cx, h) + 0.5) * s
        py = (jnp.repeat(cy, w) + 0.5) * s
        g = gts[winner]  # (P, 4)
        t = jnp.stack([(px - g[:, 0]) / base, (py - g[:, 1]) / base,
                       (g[:, 2] - px) / base, (g[:, 3] - py) / base], -1)
        t = jnp.log(jnp.clip(t, 1. / 16, 16.))
        return out_labels, t, pos

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        cls_scores, bbox_preds = preds
        b = cls_scores[0].shape[0]
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]

        cls_flat = jnp.concatenate([
            c.reshape(b, -1, self.num_classes).astype(jnp.float32)
            for c in cls_scores], axis=1)
        reg_flat = jnp.concatenate([
            r.reshape(b, -1, 4).astype(jnp.float32) for r in bbox_preds],
            axis=1)

        def one_image(gts, labels, valid):
            parts = [
                self._level_targets(l, featmap_sizes[l], gts, labels, valid)
                for l in range(len(featmap_sizes))
            ]
            return (jnp.concatenate([p[0] for p in parts]),
                    jnp.concatenate([p[1] for p in parts]),
                    jnp.concatenate([p[2] for p in parts]))

        labels, tgt, pos = jax.vmap(one_image)(gt_bboxes, gt_labels,
                                               gt_valid)
        num_pos = jnp.sum(pos.astype(jnp.float32))

        onehot = jax.nn.one_hot(labels, self.num_classes,
                                dtype=jnp.float32)  # bg rows are all-zero
        loss_cls = L.sigmoid_focal_loss(
            cls_flat, onehot, gamma=self.focal_gamma, alpha=self.focal_alpha,
            avg_factor=num_pos + b)
        # reference: sum over (num_pos, 4) elements / num_pos
        loss_bbox = L.smooth_l1_loss(
            reg_flat, tgt, beta=self.smooth_l1_beta,
            weight=pos[..., None].astype(jnp.float32),
            avg_factor=jnp.maximum(num_pos, 1.0),
            loss_weight=self.loss_bbox_weight)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    num_gts=jnp.mean(jnp.sum(gt_valid.astype(jnp.float32),
                                             axis=1)))

    # ------------------------------------------------------------------
    def get_bboxes(self, preds, scale_factors=None, score_thr: float = 0.05,
                   iou_thr: float = 0.5, max_per_img: int = 100,
                   nms_pre: int = 1000, img_shape=None,
                   with_nms: bool = True, **kwargs):
        """Decode + NMS (reference fovea_head.py _get_bboxes_single:
        exp regression scaled by base_edge around (x+0.5)*stride points,
        corners clamped to img_shape - 1)."""
        cls_scores, bbox_preds = preds
        b = cls_scores[0].shape[0]
        boxes_all, scores_all = [], []
        for lvl in range(len(cls_scores)):
            s = self.strides[lvl]
            base = self.base_edge_list[lvl]
            h, w = cls_scores[lvl].shape[1:3]
            scores = jax.nn.sigmoid(
                cls_scores[lvl].reshape(b, -1, self.num_classes).astype(
                    jnp.float32))
            reg = jnp.exp(
                bbox_preds[lvl].reshape(b, -1, 4).astype(jnp.float32))
            px = (jnp.tile(jnp.arange(w, dtype=jnp.float32), h) + 0.5) * s
            py = (jnp.repeat(jnp.arange(h, dtype=jnp.float32), w) + 0.5) * s
            k = min(nms_pre, scores.shape[1]) if with_nms else 0
            if 0 < k < scores.shape[1]:
                max_s = jnp.max(scores, axis=-1)
                _, topk = jax.lax.top_k(max_s, k)
                scores = jnp.take_along_axis(scores, topk[..., None], axis=1)
                reg = jnp.take_along_axis(reg, topk[..., None], axis=1)
                px = px[topk]
                py = py[topk]
            else:
                px = jnp.broadcast_to(px[None], (b,) + px.shape)
                py = jnp.broadcast_to(py[None], (b,) + py.shape)
            x1 = px - base * reg[..., 0]
            y1 = py - base * reg[..., 1]
            x2 = px + base * reg[..., 2]
            y2 = py + base * reg[..., 3]
            if img_shape is not None:  # reference clamps to img_shape - 1
                x1 = jnp.clip(x1, 0, img_shape[1] - 1)
                y1 = jnp.clip(y1, 0, img_shape[0] - 1)
                x2 = jnp.clip(x2, 0, img_shape[1] - 1)
                y2 = jnp.clip(y2, 0, img_shape[0] - 1)
            boxes_all.append(jnp.stack([x1, y1, x2, y2], -1))
            scores_all.append(scores)
        bbox = jnp.concatenate(boxes_all, axis=1)
        scores = jnp.concatenate(scores_all, axis=1)
        if scale_factors is not None:
            bbox = bbox / scale_factors[:, None, :]
        if not with_nms:
            return bbox, scores
        return batched_nms(bbox, scores, score_thr, iou_thr, max_per_img,
                           nms_pre=2048)
