"""Guided Anchoring (reference mmdet/models/dense_heads/
guided_anchor_head.py:858, ga_retina_head.py, ga_rpn_head.py; configs
configs/guided_anchoring/).

Per cell the head predicts:
- a location probability (``conv_loc``) trained with focal loss on
  center/ignore/negative regions (ga_loc_targets: center_ratio 0.2,
  ignore_ratio 0.5, gts assigned to levels by log2 scale, adjacent-level
  ignore maps, negatives weighted 0.1, avg factor = cells/200);
- an anchor shape delta (``conv_shape``) trained with bounded-IoU loss
  against the best-overlap gt under the ApproxMaxIoUAssigner (a cell's
  IoU = max over its 9 approx anchors — guided_anchor_head.py:476-545);
- cls/reg branches on features adapted by a deform conv whose offsets
  come from the shape prediction (FeatureAdaption,
  guided_anchor_head.py:14-56), with the decoded guided anchors
  (square + shape delta) serving as the anchor set for target
  assignment and decode.

TPU adaptations: the reference's MaskedConv2d inference trick (skip
cells whose loc prob < 0.01) exists to save GPU FLOPs on sparse cells;
on TPU dense conv over the full map is faster than gather/scatter, so
the location filter is applied to the scores instead. The reference's
per-gt python region loops become dense coordinate-grid masks with
priority center > ignore > negative. deform_groups is 1 (the pure-XLA
deform conv samples one offset field; capability-equivalent).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors import AnchorGenerator
from ...core.assigners import NEGATIVE, max_iou_assign_batch
from ...core.bbox import DeltaXYWHBBoxCoder, bbox_overlaps
from ...core.nms import batched_nms, nms_padded
from ...registry import DETECTORS, HEADS
from .. import losses as L
from ..detectors.single_stage import SingleStageDetector
from ...ops.deform_conv import DeformConv2d


class FeatureAdaption(nn.Module):
    """1x1 conv (no bias) from the 2-ch shape prediction to 3x3 deform
    offsets, then a deform conv + relu (guided_anchor_head.py:14-56)."""
    features: int
    kernel_size: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, shape_pred):
        k = self.kernel_size
        offsets = nn.Conv(2 * k * k, (1, 1), use_bias=False,
                          kernel_init=nn.initializers.normal(0.1),
                          dtype=self.dtype, name='conv_offset')(
                              jax.lax.stop_gradient(shape_pred))
        out = DeformConv2d(self.features, kernel_size=k,
                           dtype=self.dtype, name='conv_adaption')(
                               x, offsets)
        return jax.nn.relu(out)


@HEADS.register_module()
class GARetinaHead(nn.Module):
    """Guided-Anchor RetinaNet head (ga_retina_head.py)."""
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    octave_base_scale: int = 4
    scales_per_octave: int = 3
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    loc_filter_thr: float = 0.01
    # ga train cfg (configs/guided_anchoring/ga_retinanet_r50_fpn_1x)
    center_ratio: float = 0.2
    ignore_ratio: float = 0.5
    # ga_sampler RandomSampler num (reference ga configs): the shape loss
    # normalizes by the sampled fg+bg count
    ga_sample_num: int = 256
    ga_pos_iou_thr: float = 0.5
    ga_neg_iou_thr: float = 0.4
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    min_pos_iou: float = 0.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_shape_beta: float = 0.2
    loss_bbox_beta: float = 0.04
    dtype: Any = None

    @property
    def approx_generator(self) -> AnchorGenerator:
        return AnchorGenerator(
            strides=list(self.strides), ratios=list(self.ratios),
            octave_base_scale=self.octave_base_scale,
            scales_per_octave=self.scales_per_octave)

    @property
    def square_generator(self) -> AnchorGenerator:
        return AnchorGenerator(strides=list(self.strides), ratios=[1.0],
                               scales=[self.octave_base_scale])

    @property
    def bbox_coder(self) -> DeltaXYWHBBoxCoder:
        return DeltaXYWHBBoxCoder()

    @nn.compact
    def __call__(self, feats, train: bool = False):
        prior_bias = float(-math.log((1 - 0.01) / 0.01))

        def conv3(feat_out, name, bias_init=None):
            return nn.Conv(feat_out, (3, 3), padding='SAME', use_bias=True,
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_init or nn.initializers.zeros,
                           name=name)

        cls_convs = [conv3(self.feat_channels, f'cls_conv{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [conv3(self.feat_channels, f'reg_conv{i}')
                     for i in range(self.stacked_convs)]
        conv_loc = nn.Conv(1, (1, 1), dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(prior_bias),
                           name='conv_loc')
        conv_shape = nn.Conv(2, (1, 1), dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name='conv_shape')
        fa_cls = FeatureAdaption(self.feat_channels, dtype=self.dtype,
                                 name='feature_adaption_cls')
        fa_reg = FeatureAdaption(self.feat_channels, dtype=self.dtype,
                                 name='feature_adaption_reg')
        retina_cls = conv3(self.num_classes, 'retina_cls',
                           nn.initializers.constant(prior_bias))
        retina_reg = conv3(4, 'retina_reg')

        cls_out, reg_out, shape_out, loc_out = [], [], [], []
        for feat in feats:
            c = feat
            for conv in cls_convs:
                c = jax.nn.relu(conv(c))
            r = feat
            for conv in reg_convs:
                r = jax.nn.relu(conv(r))
            loc = conv_loc(c)
            shape = conv_shape(r)
            c = fa_cls(c, shape)
            r = fa_reg(r, shape)
            cls_out.append(retina_cls(c))
            reg_out.append(retina_reg(r))
            shape_out.append(shape)
            loc_out.append(loc)
        return (tuple(cls_out), tuple(reg_out), tuple(shape_out),
                tuple(loc_out))

    # ------------------------------------------------------------------
    def _level_anchors(self, featmap_sizes):
        squares = self.square_generator.grid_anchors(featmap_sizes)
        approx = self.approx_generator.grid_anchors(featmap_sizes)
        n_ap = len(self.ratios) * self.scales_per_octave
        return ([np.asarray(s) for s in squares],
                [np.asarray(a).reshape(-1, n_ap, 4) for a in approx])

    def loc_targets(self, featmap_sizes, gt_bboxes, gt_valid):
        """Dense center/ignore/negative location maps
        (guided_anchor_head.py:379-474). Returns per-level (targets
        (B,H,W), weights (B,H,W)) + the 1/200-scaled avg factor."""
        num_lvls = len(featmap_sizes)
        strides = [s for s in self.strides]
        r1 = (1 - self.center_ratio) / 2
        r2 = (1 - self.ignore_ratio) / 2
        scale = jnp.sqrt(jnp.maximum(
            (gt_bboxes[..., 2] - gt_bboxes[..., 0]) *
            (gt_bboxes[..., 3] - gt_bboxes[..., 1]), 1e-6))
        min_size = float(self.octave_base_scale * strides[0])
        tgt_lvl = jnp.clip(jnp.floor(
            jnp.log2(scale) - math.log2(min_size) + 0.5), 0, num_lvls - 1)
        tgt_lvl = tgt_lvl.astype(jnp.int32)  # (B, G)

        def region_mask(h, w, stride, boxes, ratio, active):
            """(B, G, H, W) membership of cells in the ratio-region."""
            g = boxes / stride
            x1 = jnp.round((1 - ratio) * g[..., 0] + ratio * g[..., 2])
            y1 = jnp.round((1 - ratio) * g[..., 1] + ratio * g[..., 3])
            x2 = jnp.round(ratio * g[..., 0] + (1 - ratio) * g[..., 2])
            y2 = jnp.round(ratio * g[..., 1] + (1 - ratio) * g[..., 3])
            x1 = jnp.clip(x1, 0, w - 1)
            y1 = jnp.clip(y1, 0, h - 1)
            x2 = jnp.clip(x2, 0, w - 1)
            y2 = jnp.clip(y2, 0, h - 1)
            xs = jnp.arange(w, dtype=jnp.float32)
            ys = jnp.arange(h, dtype=jnp.float32)
            in_x = (xs[None, None] >= x1[..., None]) & \
                (xs[None, None] <= x2[..., None])  # (B, G, W)
            in_y = (ys[None, None] >= y1[..., None]) & \
                (ys[None, None] <= y2[..., None])
            m = in_y[..., :, None] & in_x[..., None, :]
            return m & active[..., None, None]

        out = []
        total_cells = 0
        num_g = gt_bboxes.shape[1]
        gt_rank = jnp.arange(1, num_g + 1, dtype=jnp.int32)
        for lvl in range(num_lvls):
            h, w = featmap_sizes[lvl]
            total_cells += h * w
            own = gt_valid & (tgt_lvl == lvl)
            center = region_mask(h, w, strides[lvl], gt_bboxes, r1, own)
            ignore = region_mask(h, w, strides[lvl], gt_bboxes, r2, own)
            adj = gt_valid & ((tgt_lvl == lvl - 1) | (tgt_lvl == lvl + 1))
            adj_ignore = jnp.any(
                region_mask(h, w, strides[lvl], gt_bboxes, r2, adj), axis=1)
            targets = jnp.any(center, axis=1).astype(jnp.float32)
            # the reference paints per gt IN ORDER (ignore ring w=0, then
            # center w=1), so a LATER gt's ignore ring zeroes an EARLIER
            # gt's center cells (ga_loc_targets:440-445); reproduce the
            # overwrite with per-cell last-writer ranks
            c_rank = jnp.max(jnp.where(center, gt_rank[None, :, None, None],
                                       0), axis=1)  # (B, H, W)
            i_rank = jnp.max(jnp.where(ignore, gt_rank[None, :, None, None],
                                       0), axis=1)
            weights = jnp.where(
                (c_rank > 0) & (c_rank >= i_rank), 1.0,
                jnp.where((i_rank > 0) | adj_ignore, 0.0, 0.1))
            out.append((targets, weights))
        b = gt_bboxes.shape[0]
        return out, b * total_cells / 200.0

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        cls_scores, bbox_preds, shape_preds, loc_preds = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        squares_np, approx_np = self._level_anchors(featmap_sizes)
        squares = jnp.asarray(np.concatenate(squares_np))  # (A, 4)
        approx = jnp.asarray(np.concatenate(approx_np))  # (A, 9, 4)
        b = cls_scores[0].shape[0]
        C = self.num_classes

        flat = lambda t, d: jnp.concatenate(  # noqa: E731
            [x.reshape(b, -1, d).astype(jnp.float32) for x in t], axis=1)
        cls_flat = flat(cls_scores, C)
        reg_flat = flat(bbox_preds, 4)
        shape_flat = flat(shape_preds, 2)

        # ---- location loss
        lvl_maps, loc_avg = self.loc_targets(featmap_sizes, gt_bboxes,
                                             gt_valid)
        loss_loc = 0.
        for lvl, (tgt, wgt) in enumerate(lvl_maps):
            logit = loc_preds[lvl].astype(jnp.float32)[..., 0]
            # label-convention artifact reproduced for parity: the
            # reference feeds loc_target (1 at centers) as a LONG label
            # into a 1-channel FocalLoss, where mmdet 2.x's 0-based
            # convention makes label 0 the positive channel and label 1
            # background — so channel 0's binary target is 1-tgt
            # (focal_loss.py one-hot slice; verified against the live
            # reference). Inference's loc_filter (sigmoid >= 0.01) reads
            # the same trained signal on both sides.
            loss_loc = loss_loc + L.sigmoid_focal_loss(
                logit[..., None], (1.0 - tgt)[..., None],
                gamma=self.focal_gamma, alpha=self.focal_alpha,
                weight=wgt[..., None], reduction='sum') / loc_avg

        # ---- shape loss (approx-max-IoU assignment)
        def assign_shape(gts, valid):
            ious = bbox_overlaps(approx.reshape(-1, 4), gts)
            ious = ious.reshape(approx.shape[0], approx.shape[1], -1)
            ious = jnp.max(ious, axis=1)  # (A, G)
            ious = jnp.where(valid[None, :], ious, -1.)
            max_iou = jnp.max(ious, axis=1)
            arg = jnp.argmax(ious, axis=1).astype(jnp.int32)
            out = jnp.full(approx.shape[0], -2, jnp.int32)
            out = jnp.where(max_iou < self.ga_neg_iou_thr, NEGATIVE, out)
            out = jnp.where(max_iou >= self.ga_pos_iou_thr, arg, out)
            return out

        ga_assigned = jax.vmap(assign_shape)(gt_bboxes, gt_valid)  # (B, A)
        ga_pos = ga_assigned >= 0
        gt_idx = jnp.clip(ga_assigned, 0, None)
        matched = jnp.take_along_axis(gt_bboxes, gt_idx[..., None], axis=1)
        matched = jnp.where(ga_pos[..., None], matched,
                            jnp.broadcast_to(squares[None], matched.shape))
        pred_anchors = self._decode_shape(squares[None], shape_flat)
        # the reference normalizes by the ga_sampler's fg+bg count
        # (RandomSampler num=256/img: anchor_total_num = anchor_fg_num +
        # anchor_bg_num, guided_anchor_head.py:34-35). All positives are
        # kept in the numerator (the sampler would subsample only past
        # 128 positives per image — a documented superset).
        fg = jnp.sum(ga_pos.astype(jnp.float32), axis=1)
        fg_capped = jnp.minimum(fg, self.ga_sample_num / 2)
        neg = jnp.sum((ga_assigned == NEGATIVE).astype(jnp.float32), axis=1)
        bg = jnp.minimum(neg, self.ga_sample_num - fg_capped)
        anchor_total = jnp.maximum(jnp.sum(fg_capped + bg), 1.0)
        loss_shape = L.bounded_iou_loss(
            pred_anchors, matched, beta=self.loss_shape_beta,
            weight=ga_pos[..., None].astype(jnp.float32),
            reduction='sum') / anchor_total

        # ---- cls/bbox on guided anchors
        guided = jax.lax.stop_gradient(pred_anchors)  # (B, A, 4)
        from ...core.assigners import max_iou_assign
        assigned = jax.vmap(
            lambda a, g, gv: max_iou_assign(
                a, g, gv, self.pos_iou_thr, self.neg_iou_thr,
                self.min_pos_iou, True))(guided, gt_bboxes, gt_valid)
        pos = assigned >= 0
        neg = assigned == NEGATIVE
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        g2 = jnp.clip(assigned, 0, None)
        labels = jnp.take_along_axis(gt_labels, g2, axis=1)
        onehot = jax.nn.one_hot(labels, C) * pos[..., None]
        lw = (pos | neg).astype(jnp.float32)[..., None]
        loss_cls = L.sigmoid_focal_loss(
            cls_flat, onehot, gamma=self.focal_gamma,
            alpha=self.focal_alpha, weight=lw, avg_factor=num_pos)
        m2 = jnp.take_along_axis(gt_bboxes, g2[..., None], axis=1)
        m2 = jnp.where(pos[..., None], m2, guided)
        deltas = self.bbox_coder.encode(guided, m2)
        loss_bbox = L.smooth_l1_loss(
            reg_flat, deltas, beta=self.loss_bbox_beta,
            weight=pos[..., None].astype(jnp.float32), avg_factor=num_pos)
        return dict(loss_loc=loss_loc, loss_shape=loss_shape,
                    loss_cls=loss_cls, loss_bbox=loss_bbox,
                    num_gts=jnp.mean(jnp.sum(gt_valid.astype(jnp.float32),
                                             axis=1)))

    def _decode_shape(self, squares, shape_deltas):
        """squares (..., 4) + (dw, dh) -> guided anchors (same center)."""
        cx = (squares[..., 0] + squares[..., 2]) * 0.5
        cy = (squares[..., 1] + squares[..., 3]) * 0.5
        w = squares[..., 2] - squares[..., 0]
        h = squares[..., 3] - squares[..., 1]
        nw = w * jnp.exp(jnp.clip(shape_deltas[..., 0], -10., 10.))
        nh = h * jnp.exp(jnp.clip(shape_deltas[..., 1], -10., 10.))
        return jnp.stack([cx - nw / 2, cy - nh / 2, cx + nw / 2,
                          cy + nh / 2], axis=-1)

    # ------------------------------------------------------------------
    def get_bboxes(self, preds, scale_factors=None, score_thr: float = 0.05,
                   iou_thr: float = 0.5, max_per_img: int = 100,
                   nms_pre: int = 1000, **kwargs):
        cls_scores, bbox_preds, shape_preds, loc_preds = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        squares_np, _ = self._level_anchors(featmap_sizes)
        b = cls_scores[0].shape[0]

        all_boxes, all_scores = [], []
        for lvl in range(len(cls_scores)):
            scores = jax.nn.sigmoid(
                cls_scores[lvl].reshape(b, -1, self.num_classes).astype(
                    jnp.float32))
            loc = jax.nn.sigmoid(
                loc_preds[lvl].reshape(b, -1).astype(jnp.float32))
            # TPU-dense location filter: zero out low-probability cells
            scores = scores * (loc >= self.loc_filter_thr)[..., None]
            shape = shape_preds[lvl].reshape(b, -1, 2).astype(jnp.float32)
            deltas = bbox_preds[lvl].reshape(b, -1, 4).astype(jnp.float32)
            squares = jnp.asarray(squares_np[lvl])
            guided = self._decode_shape(squares[None], shape)
            k = min(nms_pre, scores.shape[1])
            if 0 < k < scores.shape[1]:
                max_scores = jnp.max(scores, axis=-1)
                _, topk = jax.lax.top_k(max_scores, k)
                scores = jnp.take_along_axis(scores, topk[..., None],
                                             axis=1)
                deltas = jnp.take_along_axis(deltas, topk[..., None],
                                             axis=1)
                guided = jnp.take_along_axis(guided, topk[..., None],
                                             axis=1)
            boxes = self.bbox_coder.decode(guided, deltas)
            all_boxes.append(boxes)
            all_scores.append(scores)

        bbox = jnp.concatenate(all_boxes, axis=1)
        scores = jnp.concatenate(all_scores, axis=1)
        if scale_factors is not None:
            bbox = bbox / scale_factors[:, None, :]
        return batched_nms(bbox, scores, score_thr, iou_thr, max_per_img,
                           nms_pre=min(4096, bbox.shape[1] *
                                       self.num_classes))


@HEADS.register_module()
class GARPNHead(GARetinaHead):
    """Guided-Anchor RPN head (ga_rpn_head.py): shared 3x3 conv, then the
    GA quartet (loc, shape, adapted objectness + deltas); proposal
    generation filters by the location probability. Subclasses
    GARetinaHead for the loc/shape target machinery (the reference pair
    both extend GuidedAnchorHead)."""
    num_classes: int = 1
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    octave_base_scale: int = 8
    pos_iou_thr: float = 0.7
    neg_iou_thr: float = 0.3
    min_pos_iou: float = 0.3

    @nn.compact
    def __call__(self, feats, train: bool = False):
        prior_bias = float(-math.log((1 - 0.01) / 0.01))
        rpn_conv = nn.Conv(self.feat_channels, (3, 3), padding='SAME',
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='rpn_conv')
        conv_loc = nn.Conv(1, (1, 1), dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(prior_bias),
                           name='conv_loc')
        conv_shape = nn.Conv(2, (1, 1), dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name='conv_shape')
        fa = FeatureAdaption(self.feat_channels, dtype=self.dtype,
                             name='feature_adaption')
        rpn_cls = nn.Conv(1, (1, 1), dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          name='rpn_cls')
        rpn_reg = nn.Conv(4, (1, 1), dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          name='rpn_reg')
        cls_out, reg_out, shape_out, loc_out = [], [], [], []
        for feat in feats:
            x = jax.nn.relu(rpn_conv(feat))
            loc = conv_loc(x)
            shape = conv_shape(x)
            a = fa(x, shape)
            cls_out.append(rpn_cls(a))
            reg_out.append(rpn_reg(a))
            shape_out.append(shape)
            loc_out.append(loc)
        return (tuple(cls_out), tuple(reg_out), tuple(shape_out),
                tuple(loc_out))

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        """GA losses with class-agnostic objectness BCE."""
        cls_scores, bbox_preds, shape_preds, loc_preds = preds
        ga = self
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        squares_np, approx_np = ga._level_anchors(featmap_sizes)
        squares = jnp.asarray(np.concatenate(squares_np))
        approx = jnp.asarray(np.concatenate(approx_np))
        b = cls_scores[0].shape[0]

        flat = lambda t, d: jnp.concatenate(  # noqa: E731
            [x.reshape(b, -1, d).astype(jnp.float32) for x in t], axis=1)
        cls_flat = flat(cls_scores, 1)[..., 0]
        reg_flat = flat(bbox_preds, 4)
        shape_flat = flat(shape_preds, 2)

        lvl_maps, loc_avg = ga.loc_targets(featmap_sizes, gt_bboxes,
                                           gt_valid)
        loss_loc = 0.
        for lvl, (tgt, wgt) in enumerate(lvl_maps):
            logit = loc_preds[lvl].astype(jnp.float32)[..., 0]
            # same 1-channel FocalLoss label-convention artifact as
            # GARetinaHead.loss — channel 0's binary target is 1-tgt
            loss_loc = loss_loc + L.sigmoid_focal_loss(
                logit[..., None], (1.0 - tgt)[..., None],
                gamma=self.focal_gamma,
                alpha=self.focal_alpha, weight=wgt[..., None],
                reduction='sum') / loc_avg

        def assign_shape(gts, valid):
            ious = bbox_overlaps(approx.reshape(-1, 4), gts)
            ious = ious.reshape(approx.shape[0], approx.shape[1], -1)
            ious = jnp.max(ious, axis=1)
            ious = jnp.where(valid[None, :], ious, -1.)
            max_iou = jnp.max(ious, axis=1)
            arg = jnp.argmax(ious, axis=1).astype(jnp.int32)
            out = jnp.full(approx.shape[0], -2, jnp.int32)
            out = jnp.where(max_iou < self.ga_neg_iou_thr, NEGATIVE, out)
            out = jnp.where(max_iou >= self.ga_pos_iou_thr, arg, out)
            return out

        ga_assigned = jax.vmap(assign_shape)(gt_bboxes, gt_valid)
        ga_pos = ga_assigned >= 0
        gt_idx = jnp.clip(ga_assigned, 0, None)
        matched = jnp.take_along_axis(gt_bboxes, gt_idx[..., None], axis=1)
        matched = jnp.where(ga_pos[..., None], matched,
                            jnp.broadcast_to(squares[None], matched.shape))
        pred_anchors = ga._decode_shape(squares[None], shape_flat)
        # fg+bg sampled-count normalization, as in GARetinaHead.loss
        fg = jnp.sum(ga_pos.astype(jnp.float32), axis=1)
        fg_capped = jnp.minimum(fg, self.ga_sample_num / 2)
        neg_cnt = jnp.sum((ga_assigned == NEGATIVE).astype(jnp.float32),
                          axis=1)
        bg = jnp.minimum(neg_cnt, self.ga_sample_num - fg_capped)
        anchor_total = jnp.maximum(jnp.sum(fg_capped + bg), 1.0)
        loss_shape = L.bounded_iou_loss(
            pred_anchors, matched, beta=self.loss_shape_beta,
            weight=ga_pos[..., None].astype(jnp.float32),
            reduction='sum') / anchor_total

        guided = jax.lax.stop_gradient(pred_anchors)
        from ...core.assigners import max_iou_assign
        assigned = jax.vmap(
            lambda a, g, gv: max_iou_assign(
                a, g, gv, self.pos_iou_thr, self.neg_iou_thr,
                self.min_pos_iou, True))(guided, gt_bboxes, gt_valid)
        pos = assigned >= 0
        neg = assigned == NEGATIVE
        # static 1:1 sampling cap (reference GA-RPN RandomSampler num=256,
        # pos_fraction=0.5) — without it ~87k cells dilute the positive
        # objectness gradient ~1000x
        priority = jnp.asarray(
            np.random.RandomState(11).rand(pos.shape[1]).astype(np.float32))
        half = 128
        p_rank = jnp.argsort(jnp.argsort(
            jnp.where(pos, priority[None], 2.0), axis=1), axis=1)
        pos_k = pos & (p_rank < half)
        n_pos = jnp.sum(pos_k, axis=1, keepdims=True)
        n_rank = jnp.argsort(jnp.argsort(
            jnp.where(neg, priority[None], 2.0), axis=1), axis=1)
        neg_k = neg & (n_rank < 256 - n_pos)
        sampled = pos_k | neg_k
        num = jnp.maximum(jnp.sum(sampled.astype(jnp.float32)), 1.0)
        num_pos = jnp.maximum(jnp.sum(pos_k.astype(jnp.float32)), 1.0)
        pos = pos_k  # reg loss below follows the sampled positives
        tgt = pos.astype(jnp.float32)
        bce = L.binary_cross_entropy_with_logits(cls_flat, tgt)
        loss_cls = jnp.sum(bce * sampled) / num
        g2 = jnp.clip(assigned, 0, None)
        m2 = jnp.take_along_axis(gt_bboxes, g2[..., None], axis=1)
        m2 = jnp.where(pos[..., None], m2, guided)
        deltas = self.bbox_coder.encode(guided, m2)
        loss_bbox = L.smooth_l1_loss(
            reg_flat, deltas, beta=1.0 / 9.0,
            weight=pos[..., None].astype(jnp.float32), avg_factor=num_pos)
        return dict(loss_rpn_loc=loss_loc, loss_rpn_shape=loss_shape,
                    loss_rpn_cls=loss_cls, loss_rpn_bbox=loss_bbox)

    def get_proposals(self, preds, img_shape=None, nms_pre: int = 1000,
                      max_num: int = 300, iou_thr: float = 0.7,
                      min_bbox_size: float = 0.):
        cls_scores, bbox_preds, shape_preds, loc_preds = preds
        ga = self
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        squares_np, _ = ga._level_anchors(featmap_sizes)
        b = cls_scores[0].shape[0]

        boxes_all, scores_all, level_all = [], [], []
        for lvl in range(len(cls_scores)):
            scores = jax.nn.sigmoid(
                cls_scores[lvl].reshape(b, -1).astype(jnp.float32))
            loc = jax.nn.sigmoid(
                loc_preds[lvl].reshape(b, -1).astype(jnp.float32))
            scores = scores * (loc >= self.loc_filter_thr)
            shape = shape_preds[lvl].reshape(b, -1, 2).astype(jnp.float32)
            deltas = bbox_preds[lvl].reshape(b, -1, 4).astype(jnp.float32)
            squares = jnp.asarray(squares_np[lvl])
            guided = ga._decode_shape(squares[None], shape)
            k = min(nms_pre, scores.shape[1])
            if 0 < k < scores.shape[1]:
                scores, topk = jax.lax.top_k(scores, k)
                deltas = jnp.take_along_axis(deltas, topk[..., None],
                                             axis=1)
                guided = jnp.take_along_axis(guided, topk[..., None],
                                             axis=1)
            boxes = self.bbox_coder.decode(guided, deltas,
                                           max_shape=img_shape)
            boxes_all.append(boxes)
            scores_all.append(scores)
            level_all.append(jnp.full(scores.shape, lvl, jnp.float32))

        boxes = jnp.concatenate(boxes_all, axis=1)
        scores = jnp.concatenate(scores_all, axis=1)
        levels = jnp.concatenate(level_all, axis=1)
        w = boxes[..., 2] - boxes[..., 0]
        h = boxes[..., 3] - boxes[..., 1]
        valid = (w > min_bbox_size) & (h > min_bbox_size) & (scores > 0)
        max_coord = jnp.max(jnp.where(valid[..., None], boxes, 0.))
        offset_boxes = boxes + (levels * (max_coord + 1.))[..., None]

        def one(ob, s, v, bx):
            keep_idx, keep_valid = nms_padded(ob, s, iou_thr, max_num, v)
            return (jnp.where(keep_valid[:, None], bx[keep_idx], 0.),
                    jnp.where(keep_valid, s[keep_idx], 0.), keep_valid)

        return jax.vmap(one)(offset_boxes, scores, valid, boxes)


@DETECTORS.register_module()
class GARetinaNet(SingleStageDetector):
    """configs/guided_anchoring/ga_retinanet_*."""

    def get_bboxes(self, pred_maps, **kwargs):
        cfg = dict(self.test_cfg or {})
        nms_cfg = cfg.pop('nms', None)
        if nms_cfg is not None:
            cfg['iou_thr'] = nms_cfg.get('iou_threshold', 0.5)
        cfg.pop('min_bbox_size', None)
        cfg.update(kwargs)
        return self.bbox_head.get_bboxes(pred_maps, **cfg)
