"""FSAF head (reference mmdet/models/dense_heads/fsaf_head.py:14).

Anchor-free RetinaNet branch with online feature-level selection,
shape-static:

- one "anchor" (= a stride-sized cell box) per position per level;
  TBLR-coded distances, ReLU'd and clamped to 1e-4 (fsaf_head.py:77,214).
- center-region assignment (reference center_region_assigner.py): an
  anchor is a candidate positive for a gt at EVERY level when its center
  lies in the gt's ``pos_scale``-shrunk core box; the smallest-area gt
  wins a contested anchor. Anchors inside a gt's ``neg_scale`` box that
  are not positives *for that gt* get that gt's class ignored
  ("shadowed", fsaf_head.py:160-172).
- online level selection (fsaf_head.py:262-296): per (gt, level) the mean
  elementwise loss of the gt's anchors decides its best level; positives
  at other levels are demoted (bbox loss zeroed, the gt class ignored).
- losses: elementwise focal + IoU on decoded boxes, summed and divided
  by the post-selection positive count (fsaf_head.py:297-303).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors import AnchorGenerator
from ...core.bbox import (TBLRBBoxCoder, bbox_overlaps,
                          bbox_overlaps_aligned)
from ...core.nms import batched_nms
from ...registry import HEADS
from .. import losses as L

INF = 1e8


@HEADS.register_module()
class FSAFHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    pos_scale: float = 0.2
    neg_scale: float = 0.2
    normalizer: float = 4.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    dtype: Any = None

    @property
    def anchor_generator(self) -> AnchorGenerator:
        # 1 anchor per cell, base size == stride (fsaf config:15-20)
        return AnchorGenerator(strides=list(self.strides), ratios=[1.0],
                               octave_base_scale=1, scales_per_octave=1)

    @property
    def bbox_coder(self) -> TBLRBBoxCoder:
        return TBLRBBoxCoder(normalizer=self.normalizer)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        prior_bias = float(-math.log((1 - 0.01) / 0.01))

        def conv(f, name, bias_init=None):
            return nn.Conv(f, (3, 3), padding='SAME', use_bias=True,
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_init or nn.initializers.zeros,
                           name=name)

        cls_convs = [
            conv(self.feat_channels, f'cls_conv{i}')
            for i in range(self.stacked_convs)
        ]
        reg_convs = [
            conv(self.feat_channels, f'reg_conv{i}')
            for i in range(self.stacked_convs)
        ]
        retina_cls = conv(self.num_classes, 'retina_cls',
                          nn.initializers.constant(prior_bias))
        # reg bias 0.25 prevents zero-area boxes at init (fsaf_head.py:57)
        retina_reg = conv(4, 'retina_reg', nn.initializers.constant(0.25))
        cls_out, reg_out = [], []
        for feat in feats:
            c = feat
            for cv in cls_convs:
                c = jax.nn.relu(cv(c))
            r = feat
            for cv in reg_convs:
                r = jax.nn.relu(cv(r))
            cls_out.append(retina_cls(c))
            # TBLR distances must be positive (fsaf_head.py:77)
            reg_out.append(jax.nn.relu(retina_reg(r)))
        return tuple(cls_out), tuple(reg_out)

    # ------------------------------------------------------------------
    def _flat_anchors(self, featmap_sizes):
        per_level = self.anchor_generator.grid_anchors(featmap_sizes)
        anchors = np.concatenate(per_level, axis=0)
        level_id = np.concatenate([
            np.full(len(a), i, np.int32) for i, a in enumerate(per_level)
        ])
        return anchors, level_id

    @staticmethod
    def _scale_box(gts, scale):
        cx = (gts[:, 0] + gts[:, 2]) * 0.5
        cy = (gts[:, 1] + gts[:, 3]) * 0.5
        w = (gts[:, 2] - gts[:, 0]) * 0.5 * scale
        h = (gts[:, 3] - gts[:, 1]) * 0.5 * scale
        return jnp.stack([cx - w, cy - h, cx + w, cy + h], -1)

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        cls_scores, bbox_preds = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        anchors_np, level_np = self._flat_anchors(featmap_sizes)
        anchors = jnp.asarray(anchors_np)  # (A, 4)
        num_levels = len(featmap_sizes)
        level_onehot = jax.nn.one_hot(jnp.asarray(level_np), num_levels,
                                      dtype=jnp.float32)  # (A, L)
        b = cls_scores[0].shape[0]
        C = self.num_classes

        cls_flat = jnp.concatenate([
            c.reshape(b, -1, C).astype(jnp.float32) for c in cls_scores
        ], axis=1)  # (B, A, C)
        reg_flat = jnp.concatenate([
            r.reshape(b, -1, 4).astype(jnp.float32) for r in bbox_preds
        ], axis=1)
        reg_flat = jnp.clip(reg_flat, 1e-4, None)  # fsaf_head.py:214

        a_cx = (anchors[:, 0] + anchors[:, 2]) * 0.5
        a_cy = (anchors[:, 1] + anchors[:, 3]) * 0.5

        def one_image(cls_s, reg_s, gts, labels, valid):
            core = self._scale_box(gts, self.pos_scale)
            shadow = self._scale_box(gts, self.neg_scale)
            # CenterRegionAssigner semantics (center_region_assigner.py:
            # 174-196): positive pair = anchor center STRICTLY inside the
            # FULL gt box AND IoF(anchor, core) > min_pos_iof; shadowed
            # pair = IoF(anchor, shadow) > min_pos_iof and not a core pair.
            min_pos_iof = 0.01
            in_gt = ((a_cx[:, None] > gts[None, :, 0]) &
                     (a_cx[:, None] < gts[None, :, 2]) &
                     (a_cy[:, None] > gts[None, :, 1]) &
                     (a_cy[:, None] < gts[None, :, 3]))
            iof_core = bbox_overlaps(anchors, core, mode='iof')  # (A, G)
            iof_shadow = bbox_overlaps(anchors, shadow, mode='iof')
            core_pair = in_gt & (iof_core > min_pos_iof) & valid[None, :]
            shadow0 = ((iof_shadow > min_pos_iof) & ~core_pair &
                       valid[None, :])
            area = ((gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1]))
            key = jnp.where(core_pair, area[None, :], INF)
            win = jnp.argmin(key, axis=1).astype(jnp.int32)  # (A,)
            pos = jnp.any(core_pair, axis=1)
            winner = (jax.nn.one_hot(win, gts.shape[0]) > 0) & pos[:, None]
            # core pairs that lost the smallest-area contest are shadowed
            # too (center_region_assigner.py:323-331)
            shadow_pair = shadow0 | (core_pair & ~winner)

            shadow_cls = jnp.einsum(
                'ag,gc->ac', shadow_pair.astype(jnp.float32),
                jax.nn.one_hot(labels, C)) > 0
            lab = jnp.take(labels, win)
            # override rule (center_region_assigner.py:239-247): a positive
            # whose own class is shadowed by another gt is demoted to
            # background with that class ignored
            own_shadowed = jnp.take_along_axis(
                shadow_cls, lab[:, None].astype(jnp.int32), axis=1)[:, 0]
            pos = pos & ~own_shadowed

            # elementwise losses
            onehot = jax.nn.one_hot(lab, C) * pos[:, None]
            cls_el = L.sigmoid_focal_loss(cls_s, onehot,
                                          gamma=self.focal_gamma,
                                          alpha=self.focal_alpha,
                                          reduction='none')  # (A, C)
            # shadowed (anchor, class) pairs ignored (fsaf_head.py:166-172)
            pos_cls = onehot > 0
            cls_w = jnp.where(shadow_cls, 0., 1.)

            decoded = self.bbox_coder.decode(anchors, reg_s)
            tgt_box = gts[win]
            ious = bbox_overlaps_aligned(
                decoded, jnp.where(pos[:, None], tgt_box, decoded),
                mode='iou')
            iou_el = -jnp.log(jnp.clip(ious, 1e-6, None))  # IoULoss
            iou_el = jnp.where(pos, iou_el, 0.)

            # per (gt, level) mean loss -> best level per gt
            P = jax.nn.one_hot(win, gts.shape[0]) * pos[:, None]  # (A, G)
            per_anchor = jnp.sum(cls_el * cls_w, -1) + iou_el  # (A,)
            num = jnp.einsum('al,ag,a->lg', level_onehot, P, per_anchor)
            cnt = jnp.einsum('al,ag->lg', level_onehot, P)
            mean_lg = jnp.where(cnt > 0, num / jnp.maximum(cnt, 1.), 1e6)
            best_level = jnp.argmin(mean_lg, axis=0).astype(jnp.int32)  # (G,)

            keep = pos & (jnp.take(best_level, win) ==
                          jnp.asarray(level_np))  # (A,)
            # demoted positives: zero bbox loss, ignore their gt class
            demoted = pos & ~keep
            cls_w = jnp.where(demoted[:, None] & pos_cls, 0., cls_w)
            iou_el = jnp.where(keep, iou_el, 0.)
            return jnp.sum(cls_el * cls_w), jnp.sum(iou_el), \
                jnp.sum(keep.astype(jnp.float32)), \
                jnp.sum((~pos).astype(jnp.float32))

        cls_sum, reg_sum, n_pos, n_neg = jax.vmap(one_image)(
            cls_flat, reg_flat, gt_bboxes, gt_labels, gt_valid)
        num_pos = jnp.sum(n_pos)
        avg = jnp.where(num_pos > 0, num_pos, jnp.sum(n_neg))
        avg = jnp.maximum(avg, 1.0)
        return dict(loss_cls=jnp.sum(cls_sum) / avg,
                    loss_bbox=jnp.sum(reg_sum) / avg,
                    num_pos=num_pos / b,
                    num_gts=jnp.mean(jnp.sum(gt_valid.astype(jnp.float32),
                                             axis=1)))

    # ------------------------------------------------------------------
    def get_bboxes(self, preds, scale_factors=None, score_thr: float = 0.05,
                   iou_thr: float = 0.5, max_per_img: int = 100,
                   nms_pre: int = 1000, img_shape=None, with_nms: bool = True,
                   **kwargs):
        cls_scores, bbox_preds = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        mlvl_anchors = self.anchor_generator.grid_anchors(featmap_sizes)
        b = cls_scores[0].shape[0]
        boxes_all, scores_all = [], []
        for lvl in range(len(cls_scores)):
            scores = jax.nn.sigmoid(
                cls_scores[lvl].reshape(b, -1, self.num_classes).astype(
                    jnp.float32))
            reg = bbox_preds[lvl].reshape(b, -1, 4).astype(jnp.float32)
            anchors = jnp.asarray(mlvl_anchors[lvl])
            k = min(nms_pre, scores.shape[1]) if with_nms else 0
            if 0 < k < scores.shape[1]:
                max_s = jnp.max(scores, axis=-1)
                _, topk = jax.lax.top_k(max_s, k)
                scores = jnp.take_along_axis(scores, topk[..., None], axis=1)
                reg = jnp.take_along_axis(reg, topk[..., None], axis=1)
                sel = anchors[topk]
            else:
                sel = jnp.broadcast_to(anchors[None], (b,) + anchors.shape)
            boxes_all.append(self.bbox_coder.decode(sel, reg,
                                                    max_shape=img_shape))
            scores_all.append(scores)
        bbox = jnp.concatenate(boxes_all, axis=1)
        scores = jnp.concatenate(scores_all, axis=1)
        if scale_factors is not None:
            bbox = bbox / scale_factors[:, None, :]
        if not with_nms:
            padding = jnp.zeros(scores.shape[:-1] + (1,), scores.dtype)
            return bbox, jnp.concatenate([scores, padding], axis=-1)
        return batched_nms(bbox, scores, score_thr, iou_thr, max_per_img,
                           nms_pre=2048)
