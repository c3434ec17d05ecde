"""FCOS head — anchor-free single-stage family (reference
mmdet/models/dense_heads/fcos_head.py).

Shape-static rebuild: per-level cls/reg conv towers with a learnable
per-level scale on the distance regression, centerness branch, and the
FCOS assignment — each point claims the smallest-area padded gt that
contains it within the level's regress range — as dense (P, G) math.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.nms import batched_nms
from ...registry import HEADS
from .. import losses as L

INF = 1e8


def level_points(featmap_size, stride) -> np.ndarray:
    """(H*W, 2) point centers at stride/2 offsets (reference
    mmdet/core/anchor/point_generator.py semantics used by FCOS)."""
    h, w = featmap_size
    xs = (np.arange(w, dtype=np.float32) + 0.5) * stride
    ys = (np.arange(h, dtype=np.float32) + 0.5) * stride
    xx = np.tile(xs, h)
    yy = np.repeat(ys, w)
    return np.stack([xx, yy], axis=-1)


@HEADS.register_module()
class FCOSHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    regress_ranges: Tuple = ((-1, 64), (64, 128), (128, 256), (256, 512),
                             (512, INF))
    center_sampling: bool = False
    center_sample_radius: float = 1.5
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        import math
        prior_bias = float(-math.log((1 - 0.01) / 0.01))

        def tower(name):
            return [
                nn.Conv(self.feat_channels, (3, 3), padding='SAME',
                        dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.01),
                        name=f'{name}_conv{i}')
                for i in range(self.stacked_convs)
            ]

        cls_tower = tower('cls')
        reg_tower = tower('reg')
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding='SAME',
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(prior_bias),
                           name='conv_cls')
        conv_reg = nn.Conv(4, (3, 3), padding='SAME', dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_reg')
        conv_centerness = nn.Conv(1, (3, 3), padding='SAME',
                                  dtype=self.dtype,
                                  kernel_init=nn.initializers.normal(0.01),
                                  name='conv_centerness')
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
            cls_out.append(conv_cls(c))
            # exp(scale * reg): positive distances (reference fcos norm_
            # on_bbox=False variant)
            reg_out.append(jnp.exp(
                conv_reg(r).astype(jnp.float32) * scales[lvl]))
            ctr_out.append(conv_centerness(r))
        return tuple(cls_out), tuple(reg_out), tuple(ctr_out)

    # ------------------------------------------------------------------
    def _all_points(self, featmap_sizes):
        pts = [
            level_points(featmap_sizes[i], self.strides[i])
            for i in range(len(featmap_sizes))
        ]
        ranges = np.concatenate([
            np.tile(np.asarray(self.regress_ranges[i], np.float32),
                    (len(pts[i]), 1)) for i in range(len(pts))
        ])
        return np.concatenate(pts), ranges

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        cls_scores, bbox_preds, centernesses = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        points_np, ranges_np = self._all_points(featmap_sizes)
        points = jnp.asarray(points_np)  # (P, 2)
        ranges = jnp.asarray(ranges_np)  # (P, 2)
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

        def assign_one(gts, valid):
            # ltrb distances point -> gt sides: (P, G, 4)
            l = points[:, None, 0] - gts[None, :, 0]
            t = points[:, None, 1] - gts[None, :, 1]
            r = gts[None, :, 2] - points[:, None, 0]
            bot = gts[None, :, 3] - points[:, None, 1]
            ltrb = jnp.stack([l, t, r, bot], axis=-1)
            inside = jnp.min(ltrb, axis=-1) > 0  # (P, G)
            maxd = jnp.max(ltrb, axis=-1)
            in_range = (maxd >= ranges[:, None, 0]) & \
                       (maxd <= ranges[:, None, 1])
            areas = ((gts[:, 2] - gts[:, 0]) *
                     (gts[:, 3] - gts[:, 1]))[None, :]
            cand = inside & in_range & valid[None, :]
            areas = jnp.where(cand, areas, INF)
            gt_idx = jnp.argmin(areas, axis=1).astype(jnp.int32)
            pos = jnp.any(cand, axis=1)
            tgt = jnp.take_along_axis(ltrb, gt_idx[:, None, None],
                                      axis=1)[:, 0]  # (P, 4)
            return gt_idx, pos, tgt

        gt_idx, pos, tgt_ltrb = jax.vmap(assign_one)(gt_bboxes, gt_valid)
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)

        labels = jnp.take_along_axis(gt_labels, gt_idx, axis=1)
        onehot = jax.nn.one_hot(labels, self.num_classes) * pos[..., None]
        loss_cls = L.sigmoid_focal_loss(
            cls_flat, onehot, gamma=self.focal_gamma, alpha=self.focal_alpha,
            avg_factor=num_pos)

        # centerness targets (reference fcos_head.centerness_target)
        lr_ = tgt_ltrb[..., [0, 2]]
        tb_ = tgt_ltrb[..., [1, 3]]
        ctr_tgt = jnp.sqrt(jnp.clip(
            (jnp.min(lr_, -1) / jnp.maximum(jnp.max(lr_, -1), 1e-6)) *
            (jnp.min(tb_, -1) / jnp.maximum(jnp.max(tb_, -1), 1e-6)),
            0., 1.))
        ctr_tgt = jnp.where(pos, ctr_tgt, 0.)

        # IoU loss on decoded boxes, centerness-weighted
        def decode(ltrb):
            x1 = points[None, :, 0] - ltrb[..., 0]
            y1 = points[None, :, 1] - ltrb[..., 1]
            x2 = points[None, :, 0] + ltrb[..., 2]
            y2 = points[None, :, 1] + ltrb[..., 3]
            return jnp.stack([x1, y1, x2, y2], axis=-1)

        pred_boxes = decode(reg_flat)
        tgt_boxes = decode(jnp.clip(tgt_ltrb, 0., None))
        w = ctr_tgt * pos
        # reference FCOS regresses with plain IoULoss = -log(IoU)
        # (configs/fcos/*: loss_bbox IoULoss; fcos_head.py:246-250), NOT
        # GIoU — weighted by the centerness targets, normalized by their
        # sum. Padded rows carry w=0 but still flow through -log(IoU):
        # feed them their own prediction so the log stays finite.
        tgt_safe = jnp.where((w > 0)[..., None], tgt_boxes,
                             jax.lax.stop_gradient(pred_boxes))
        loss_bbox = L.iou_loss(pred_boxes, tgt_safe, weight=w,
                               avg_factor=jnp.maximum(jnp.sum(w), 1e-6))
        loss_ctr = L.bce_loss(ctr_flat, ctr_tgt,
                              weight=pos.astype(jnp.float32),
                              avg_factor=num_pos)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_centerness=loss_ctr,
                    num_gts=jnp.mean(jnp.sum(gt_valid.astype(jnp.float32),
                                             axis=1)))

    # ------------------------------------------------------------------
    def get_bboxes(self, preds, scale_factors=None, score_thr: float = 0.05,
                   iou_thr: float = 0.5, max_per_img: int = 100,
                   nms_pre: int = 1000, img_shape=None,
                   with_nms: bool = True, **kwargs):
        """Decode + NMS (reference fcos_head.py _get_bboxes: per-level
        top-k ranked by scores*centerness, distance2bbox clipped to
        ``img_shape``, centerness folded into the NMS score)."""
        cls_scores, bbox_preds, centernesses = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        b = cls_scores[0].shape[0]
        boxes_all, scores_all = [], []
        for lvl in range(len(cls_scores)):
            pts = jnp.asarray(level_points(featmap_sizes[lvl],
                                           self.strides[lvl]))
            scores = jax.nn.sigmoid(
                cls_scores[lvl].reshape(b, -1, self.num_classes).astype(
                    jnp.float32))
            ctr = jax.nn.sigmoid(
                centernesses[lvl].reshape(b, -1).astype(jnp.float32))
            ltrb = bbox_preds[lvl].reshape(b, -1, 4).astype(jnp.float32)
            scores = scores * ctr[..., None]
            k = min(nms_pre, scores.shape[1]) if with_nms else 0
            if 0 < k < scores.shape[1]:
                max_s = jnp.max(scores, axis=-1)
                _, topk = jax.lax.top_k(max_s, k)
                scores = jnp.take_along_axis(scores, topk[..., None], axis=1)
                ltrb = jnp.take_along_axis(ltrb, topk[..., None], axis=1)
                lvl_pts = pts[topk]
            else:
                lvl_pts = jnp.broadcast_to(pts[None], (b,) + pts.shape)
            x1 = lvl_pts[..., 0] - ltrb[..., 0]
            y1 = lvl_pts[..., 1] - ltrb[..., 1]
            x2 = lvl_pts[..., 0] + ltrb[..., 2]
            y2 = lvl_pts[..., 1] + ltrb[..., 3]
            if img_shape is not None:  # distance2bbox max_shape clip
                x1 = jnp.clip(x1, 0, img_shape[1])
                y1 = jnp.clip(y1, 0, img_shape[0])
                x2 = jnp.clip(x2, 0, img_shape[1])
                y2 = jnp.clip(y2, 0, img_shape[0])
            boxes_all.append(jnp.stack([x1, y1, x2, y2], axis=-1))
            scores_all.append(scores)
        bbox = jnp.concatenate(boxes_all, axis=1)
        scores = jnp.concatenate(scores_all, axis=1)
        if scale_factors is not None:
            bbox = bbox / scale_factors[:, None, :]
        if not with_nms:
            return bbox, scores
        return batched_nms(bbox, scores, score_thr, iou_thr, max_per_img,
                           nms_pre=2048)