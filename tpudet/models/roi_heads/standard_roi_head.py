"""Standard two-stage RoI head (reference mmdet/models/roi_heads/
standard_roi_head.py + bbox sampling machinery), shape-static:

- training: proposals (+ gt boxes appended, reference RandomSampler
  add_gt_as_proposals) are MaxIoU-assigned to padded gts, then 512 are
  "sampled" per image with <=25% positives using a fixed pseudo-random
  priority (deterministic, static replacement for RandomSampler);
- pooled features come from the pure-XLA multilevel RoIAlign;
- losses: softmax CE over sampled rois + class-specific L1 on positives;
- testing: class softmax + per-class delta decode -> padded multiclass
  NMS.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.assigners import max_iou_assign_batch
from ...core.bbox import DeltaXYWHBBoxCoder
from ...core.nms import batched_nms
from ...ops.roi_align import multilevel_roi_align
from ...registry import HEADS
from .. import losses as L
from .bbox_head import Shared2FCBBoxHead


@HEADS.register_module()
class StandardRoIHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    featmap_strides: Tuple[int, ...] = (4, 8, 16, 32)
    roi_size: int = 7
    num_samples: int = 512
    pos_fraction: float = 0.25
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    min_pos_iou: float = 0.5
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    # bbox head selection + norm (configs/gn, gn+ws use the 4conv1fc
    # head with GN/WS)
    bbox_head_type: str = 'Shared2FCBBoxHead'
    norm: Any = None
    gn_groups: int = 32
    conv_ws: bool = False
    # negative sampling: 'random' or 'iou_balanced' (Libra R-CNN,
    # reference iou_balanced_neg_sampler.py)
    neg_sampling: str = 'random'
    neg_num_bins: int = 3
    # bbox regression loss: 'l1' or 'balanced_l1' (Libra R-CNN)
    loss_bbox_type: str = 'l1'
    # roi extractor: 'single' (size-mapped level, SingleRoIExtractor) or
    # 'generic' (sum over ALL levels + ContextBlock post-processing —
    # GRoIE, reference configs/groie GenericRoIExtractor)
    roi_extractor: str = 'single'
    dtype: Any = None

    def setup(self):
        if self.bbox_head_type == 'Shared4Conv1FCBBoxHead':
            from .bbox_head import Shared4Conv1FCBBoxHead
            self.bbox_head = Shared4Conv1FCBBoxHead(
                num_classes=self.num_classes, in_channels=self.in_channels,
                roi_feat_size=self.roi_size, target_stds=self.target_stds,
                norm=self.norm, gn_groups=self.gn_groups,
                conv_ws=self.conv_ws, dtype=self.dtype)
        else:
            self.bbox_head = Shared2FCBBoxHead(
                num_classes=self.num_classes, in_channels=self.in_channels,
                roi_feat_size=self.roi_size, target_stds=self.target_stds,
                dtype=self.dtype)

    @property
    def bbox_coder(self):
        return DeltaXYWHBBoxCoder(target_stds=self.target_stds)

    def extract(self, feats, rois, roi_valid, out_size=None):
        """Batched multilevel RoIAlign: feats (tuple of (B,H,W,C)),
        rois (B, P, 4) -> (B, P, s, s, C), s = out_size or roi_size."""
        size = out_size or self.roi_size
        feats = tuple(feats[:len(self.featmap_strides)])

        if self.roi_extractor == 'generic':
            # GRoIE: aggregate (sum) RoIAlign from EVERY pyramid level
            # instead of picking one by roi size (reference
            # GenericRoIExtractor, configs/groie)
            from ...ops.roi_align import roi_align

            def one(img_feats, r, v):
                acc = None
                for lvl, stride in enumerate(self.featmap_strides):
                    p = roi_align(img_feats[lvl], r, out_size=size,
                                  spatial_scale=1.0 / stride)
                    acc = p if acc is None else acc + p
                return acc

            pooled = jax.vmap(one)(feats, rois, roi_valid)
            pooled = pooled * roi_valid[..., None, None, None]
            return pooled

        def one(img_feats, r, v):
            return multilevel_roi_align(
                img_feats, r, v, out_size=size,
                strides=self.featmap_strides)

        # vmap over the batch axis of every pyramid level simultaneously
        return jax.vmap(one)(feats, rois, roi_valid)

    def __call__(self, feats, rois, roi_valid, train: bool = False):
        """Pool + bbox head forward: (B, P, C+1), (B, P, 4C)."""
        pooled = self.extract(feats, rois, roi_valid)
        return self.bbox_head(pooled, train)

    # ------------------------------------------------------------------
    def sample_rois(self, proposals, prop_valid, gt_bboxes, gt_labels,
                    gt_valid, num_samples: Optional[int] = None,
                    iou_thr=None, return_is_gt: bool = False):
        """Assign + static 'random' sampling -> fixed-size roi batch.

        ``iou_thr`` (scalar, possibly traced) overrides the pos/neg/min
        thresholds jointly — the DynamicRCNN adaptation hook.

        Returns rois (B, S, 4), roi_valid, labels (B, S) with background
        == num_classes, reg targets (B, S, 4), pos mask (B, S).
        """
        s = num_samples or self.num_samples
        pos_thr = self.pos_iou_thr if iou_thr is None else iou_thr
        neg_thr = self.neg_iou_thr if iou_thr is None else iou_thr
        min_thr = self.min_pos_iou if iou_thr is None else iou_thr
        # append gts as proposals (reference add_gt_as_proposals=True)
        rois = jnp.concatenate([proposals, gt_bboxes], axis=1)
        valid = jnp.concatenate([prop_valid, gt_valid], axis=1)

        def assign_one(r, v, g, gv):
            from ...core.assigners import max_iou_assign
            a = max_iou_assign(r, g, gv, pos_thr, neg_thr, min_thr, True)
            return jnp.where(v, a, -2)  # invalid rois -> ignore

        assigned = jax.vmap(assign_one)(rois, valid, gt_bboxes, gt_valid)
        pos = assigned >= 0
        neg = assigned == -1

        n_rois = rois.shape[1]
        priority = jnp.asarray(
            np.random.RandomState(1).rand(n_rois).astype(np.float32))
        max_pos = int(s * self.pos_fraction)
        pos_rank = jnp.argsort(jnp.argsort(
            jnp.where(pos, priority[None], 2.0), axis=1), axis=1)
        pos_keep = pos & (pos_rank < max_pos)
        n_pos = jnp.sum(pos_keep, axis=1, keepdims=True)
        if self.neg_sampling == 'iou_balanced':
            # Libra R-CNN IoU-balanced negatives (reference
            # iou_balanced_neg_sampler.py): split [0, neg_iou_thr) into
            # num_bins, take an equal share per bin, fill any shortfall
            # from the global negative pool.
            from ...core.bbox import bbox_overlaps

            def max_iou_one(r, g, gv):
                ious = bbox_overlaps(r, g)  # (R, G)
                return jnp.max(
                    jnp.where(gv[None, :], ious, 0.0), axis=1)

            max_iou = jax.vmap(max_iou_one)(rois, gt_bboxes, gt_valid)
            n_bins = self.neg_num_bins
            bin_w = float(neg_thr) / n_bins if float(neg_thr) > 0 else 1.0
            bin_id = jnp.clip((max_iou / bin_w).astype(jnp.int32), 0,
                              n_bins - 1)
            per_bin = (s - n_pos) // n_bins + 1
            neg_keep = jnp.zeros_like(neg)
            for bi in range(n_bins):
                in_bin = neg & (bin_id == bi)
                rank = jnp.argsort(jnp.argsort(
                    jnp.where(in_bin, priority[None], 2.0), axis=1), axis=1)
                neg_keep = neg_keep | (in_bin & (rank < per_bin))
            # fill shortfall with the remaining highest-priority negatives
            deficit = (s - n_pos) - jnp.sum(neg_keep, axis=1, keepdims=True)
            rest = neg & ~neg_keep
            rest_rank = jnp.argsort(jnp.argsort(
                jnp.where(rest, priority[None], 2.0), axis=1), axis=1)
            neg_keep = neg_keep | (rest & (rest_rank < deficit))
            # trim any overshoot deterministically
            keep_rank = jnp.argsort(jnp.argsort(
                jnp.where(neg_keep, priority[None], 2.0), axis=1), axis=1)
            neg_keep = neg_keep & (keep_rank < s - n_pos)
        else:
            neg_rank = jnp.argsort(jnp.argsort(
                jnp.where(neg, priority[None], 2.0), axis=1), axis=1)
            neg_keep = neg & (neg_rank < s - n_pos)
        sampled = pos_keep | neg_keep

        # gather the sampled rois into a fixed (B, S) slot table:
        # order sampled-first via argsort on (!sampled)
        order = jnp.argsort(~sampled, axis=1, stable=True)[:, :s]
        take = lambda x: jnp.take_along_axis(  # noqa: E731
            x, order.reshape(order.shape + (1,) * (x.ndim - 2)), axis=1)
        out_rois = take(rois)
        out_sampled = jnp.take_along_axis(sampled, order, axis=1)
        out_pos = jnp.take_along_axis(pos_keep, order, axis=1)
        out_assigned = jnp.take_along_axis(assigned, order, axis=1)

        gt_idx = jnp.clip(out_assigned, 0, None)
        labels = jnp.where(
            out_pos, jnp.take_along_axis(gt_labels, gt_idx, axis=1),
            self.num_classes)
        matched = jnp.take_along_axis(gt_bboxes, gt_idx[..., None], axis=1)
        matched = jnp.where(out_pos[..., None], matched, out_rois)
        targets = self.bbox_coder.encode(out_rois, matched)
        if return_is_gt:
            # which sampled slots came from the appended gt block — the
            # reference's SamplingResult.pos_is_gt, consumed by cascade's
            # refine_bboxes (bbox_head.py:420 keep = 1 - pos_is_gts)
            src_is_gt = jnp.arange(n_rois) >= proposals.shape[1]
            out_is_gt = jnp.take_along_axis(
                jnp.broadcast_to(src_is_gt[None], sampled.shape), order,
                axis=1)
            return (out_rois, out_sampled, labels, targets, out_pos,
                    out_is_gt)
        return out_rois, out_sampled, labels, targets, out_pos

    def loss(self, cls_logits, deltas, labels, targets, pos, sampled,
             rois=None) -> Dict:
        """Softmax CE + class-specific L1 (reference bbox_head.loss)."""
        num_total = jnp.maximum(jnp.sum(sampled.astype(jnp.float32)), 1.0)
        logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        loss_cls = jnp.sum(ce * sampled) / num_total

        b, s_ = labels.shape
        if deltas.shape[-1] == 4:
            reg = deltas.astype(jnp.float32)
        else:
            reg = deltas.reshape(b, s_, self.num_classes, 4).astype(
                jnp.float32)
            cls_idx = jnp.clip(labels, 0, self.num_classes - 1)
            reg = jnp.take_along_axis(
                reg, cls_idx[..., None, None].repeat(4, -1), axis=2)[:, :, 0]
        if self.loss_bbox_type == 'balanced_l1':
            loss_bbox = L.balanced_l1_loss(
                reg, targets, weight=pos[..., None].astype(jnp.float32),
                avg_factor=num_total)
        elif self.loss_bbox_type == 'smooth_l1':
            # cascade stages regress with SmoothL1(beta=1), not plain L1
            # (reference cascade_rcnn_r50_fpn.py loss_bbox per stage)
            loss_bbox = L.smooth_l1_loss(
                reg, targets, beta=1.0,
                weight=pos[..., None].astype(jnp.float32),
                avg_factor=num_total)
        else:
            loss_bbox = L.l1_loss(reg, targets,
                                  weight=pos[..., None].astype(jnp.float32),
                                  avg_factor=num_total)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

    # ------------------------------------------------------------------
    def get_bboxes(self, rois, roi_valid, cls_logits, deltas,
                   scale_factors=None, score_thr: float = 0.05,
                   iou_thr: float = 0.5, max_per_img: int = 100,
                   img_shape=None, **kwargs):
        """Final decode + class-aware NMS (reference
        bbox_head.py::get_bboxes: softmax scores with the bg column
        stripped, per-class DeltaXYWH decode clipped to ``img_shape``,
        multiclass_nms)."""
        scores = jax.nn.softmax(cls_logits.astype(jnp.float32),
                                axis=-1)[..., :-1]  # (B, P, C)
        scores = scores * roi_valid[..., None]
        b, p = rois.shape[:2]

        def bound(v, extra_dims):
            # per-image (B, 1) bounds reshape to broadcast over the
            # (B, P[, C]) coordinate planes; python scalars pass through
            if hasattr(v, 'ndim') and getattr(v, 'ndim', 0) >= 1:
                return jnp.reshape(v, (-1,) + (1,) * extra_dims)
            return v

        if deltas.shape[-1] == 4:
            shp = None if img_shape is None else (
                bound(img_shape[0], 1), bound(img_shape[1], 1))
            boxes = self.bbox_coder.decode(rois, deltas.astype(jnp.float32),
                                           max_shape=shp)
            boxes_pc = jnp.broadcast_to(boxes[:, :, None],
                                        (b, p, self.num_classes, 4))
        else:
            reg = deltas.reshape(b, p, self.num_classes, 4).astype(
                jnp.float32)
            shp = None if img_shape is None else (
                bound(img_shape[0], 2), bound(img_shape[1], 2))
            boxes_pc = self.bbox_coder.decode(rois[:, :, None], reg,
                                              max_shape=shp)
        if scale_factors is not None:
            boxes_pc = boxes_pc / scale_factors[:, None, None, :]
        # per-pair (roi, class) candidates with their own boxes: run the
        # class-offset NMS directly on flattened pairs
        from ...core.nms import NEG_INF, NMSResult, nms_padded
        flat_boxes = boxes_pc.reshape(b, p * self.num_classes, 4)
        flat_scores = scores.reshape(b, p * self.num_classes)
        labels = jnp.tile(jnp.arange(self.num_classes, dtype=jnp.int32), p)

        def one(bx, sc):
            valid = sc > score_thr
            k = min(2048, bx.shape[0])
            top_s, top_i = jax.lax.top_k(
                jnp.where(valid, sc, NEG_INF), k)
            top_valid = top_s > NEG_INF / 2
            cand = bx[top_i]
            lab = labels[top_i]
            max_coord = jnp.max(jnp.where(top_valid[:, None], cand, 0.))
            off = cand + (lab.astype(cand.dtype) * (max_coord + 1.))[:, None]
            keep_idx, keep_valid = nms_padded(off, top_s, iou_thr,
                                              max_per_img, top_valid)
            return NMSResult(
                jnp.where(keep_valid[:, None], cand[keep_idx], 0.),
                jnp.where(keep_valid, top_s[keep_idx], 0.),
                jnp.where(keep_valid, lab[keep_idx], -1),
                keep_valid)

        return jax.vmap(one)(flat_boxes, flat_scores)