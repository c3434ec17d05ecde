"""Box coders and IoU primitives — pure jnp functions.

Replaces the reference's torch bbox machinery
(reference: mmdet/core/bbox/coder/yolov4_bbox_coder.py:39-67,
mmdet/core/bbox/coder/delta_xywh_bbox_coder.py,
mmdet/core/bbox/iou_calculators/iou2d_calculator.py:74) with functional,
vectorized, fully-shape-static jnp: these fuse into surrounding XLA programs
with no kernel boundaries.

All boxes are xyxy float arrays; functions broadcast over leading dims.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..registry import BBOX_CODERS, build_from_cfg


def build_bbox_coder(cfg, **default_args):
    return build_from_cfg(cfg, BBOX_CODERS, default_args or None)


@BBOX_CODERS.register_module()
class YOLOV4BBoxCoder:
    """Decode YOLOv4/v5 regressions around anchor centers.

    Matches reference yolov4_bbox_coder.py:39-67:
    ``x = pred_x * stride + anchor_cx``, ``w = pred_w * anchor_w``; the
    sigmoid/affine transform of raw logits happens in the head.
    Encode is intentionally unimplemented, as in the reference (:37).
    """

    def __init__(self, eps: float = 1e-6):
        self.eps = eps

    def encode(self, bboxes, gt_bboxes, stride):
        raise NotImplementedError

    @staticmethod
    def decode(bboxes, pred_bboxes, stride):
        """bboxes: (..., 4) anchors xyxy; pred_bboxes: (..., 4) transformed
        predictions (xy in [-1,1], wh multiplicative); stride: scalar."""
        x_center = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        y_center = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        w = bboxes[..., 2] - bboxes[..., 0]
        h = bboxes[..., 3] - bboxes[..., 1]
        x_pred = pred_bboxes[..., 0] * stride + x_center
        y_pred = pred_bboxes[..., 1] * stride + y_center
        w_pred = pred_bboxes[..., 2] * w
        h_pred = pred_bboxes[..., 3] * h
        return jnp.stack((x_pred - w_pred / 2, y_pred - h_pred / 2,
                          x_pred + w_pred / 2, y_pred + h_pred / 2), axis=-1)


@BBOX_CODERS.register_module()
class DeltaXYWHBBoxCoder:
    """Delta xywh coder used by the generic anchor path (RetinaNet).

    Matches reference delta_xywh_bbox_coder.py semantics: normalized
    (dx, dy, dw, dh) deltas with mean/std, dw/dh clamped at decode by
    ``wh_ratio_clip``.
    """

    def __init__(self,
                 target_means=(0., 0., 0., 0.),
                 target_stds=(1., 1., 1., 1.),
                 clip_border=True,
                 add_ctr_clamp=False,
                 ctr_clamp=32):
        self.means = np.asarray(target_means, dtype=np.float32)
        self.stds = np.asarray(target_stds, dtype=np.float32)
        self.clip_border = clip_border
        # YOLOF variant (reference delta_xywh_bbox_coder.py): clamp the
        # center shift in pixels and only upper-clamp dw/dh
        self.add_ctr_clamp = add_ctr_clamp
        self.ctr_clamp = ctr_clamp

    def encode(self, bboxes, gt_bboxes):
        # eps-clamp: padded/degenerate rows (zero-size proposals or the
        # all-zero gt padding slots) flow through encode under static
        # shapes; log(0/0) would poison the loss through 0-weight * NaN
        # even though those rows are masked. No effect on real boxes.
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = jnp.maximum(bboxes[..., 2] - bboxes[..., 0], 1e-6)
        ph = jnp.maximum(bboxes[..., 3] - bboxes[..., 1], 1e-6)
        gx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) * 0.5
        gy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) * 0.5
        gw = jnp.maximum(gt_bboxes[..., 2] - gt_bboxes[..., 0], 1e-6)
        gh = jnp.maximum(gt_bboxes[..., 3] - gt_bboxes[..., 1], 1e-6)
        dx = (gx - px) / pw
        dy = (gy - py) / ph
        dw = jnp.log(gw / pw)
        dh = jnp.log(gh / ph)
        deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
        return (deltas - self.means) / self.stds

    def decode(self, bboxes, pred_bboxes, max_shape=None,
               wh_ratio_clip=16 / 1000):
        deltas = pred_bboxes * self.stds + self.means
        dx, dy = deltas[..., 0], deltas[..., 1]
        max_ratio = abs(float(np.log(wh_ratio_clip)))
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = bboxes[..., 2] - bboxes[..., 0]
        ph = bboxes[..., 3] - bboxes[..., 1]
        dx_width = pw * dx
        dy_height = ph * dy
        if self.add_ctr_clamp:
            dx_width = jnp.clip(dx_width, -self.ctr_clamp, self.ctr_clamp)
            dy_height = jnp.clip(dy_height, -self.ctr_clamp, self.ctr_clamp)
            dw = jnp.clip(deltas[..., 2], None, max_ratio)
            dh = jnp.clip(deltas[..., 3], None, max_ratio)
        else:
            dw = jnp.clip(deltas[..., 2], -max_ratio, max_ratio)
            dh = jnp.clip(deltas[..., 3], -max_ratio, max_ratio)
        gw = pw * jnp.exp(dw)
        gh = ph * jnp.exp(dh)
        gx = px + dx_width
        gy = py + dy_height
        x1 = gx - gw * 0.5
        y1 = gy - gh * 0.5
        x2 = gx + gw * 0.5
        y2 = gy + gh * 0.5
        if self.clip_border and max_shape is not None:
            x1 = jnp.clip(x1, 0, max_shape[1])
            y1 = jnp.clip(y1, 0, max_shape[0])
            x2 = jnp.clip(x2, 0, max_shape[1])
            y2 = jnp.clip(y2, 0, max_shape[0])
        return jnp.stack([x1, y1, x2, y2], axis=-1)


@BBOX_CODERS.register_module()
class YOLOBBoxCoder:
    """YOLOv3 coder (reference mmdet/core/bbox/coder/yolo_bbox_coder.py):
    xy encoded as in-cell offset in [eps, 1-eps] (sigmoid-space target),
    wh as log scale vs anchor."""

    def __init__(self, eps: float = 1e-6):
        self.eps = eps

    def encode(self, bboxes, gt_bboxes, stride):
        x_c = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        y_c = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        w = bboxes[..., 2] - bboxes[..., 0]
        h = bboxes[..., 3] - bboxes[..., 1]
        gx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) * 0.5
        gy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) * 0.5
        gw = gt_bboxes[..., 2] - gt_bboxes[..., 0]
        gh = gt_bboxes[..., 3] - gt_bboxes[..., 1]
        w_t = jnp.log(jnp.clip(gw / w, self.eps, None))
        h_t = jnp.log(jnp.clip(gh / h, self.eps, None))
        x_t = jnp.clip((gx - x_c) / stride + 0.5, self.eps, 1 - self.eps)
        y_t = jnp.clip((gy - y_c) / stride + 0.5, self.eps, 1 - self.eps)
        return jnp.stack([x_t, y_t, w_t, h_t], axis=-1)

    @staticmethod
    def decode(bboxes, pred_bboxes, stride):
        """pred xy already sigmoided to (0,1); wh raw log-scale.

        The log-scale is clamped at ±8 before exp (a 2981x anchor-size
        ratio, far beyond any trained prediction — the reference decodes
        unclamped, yolo_bbox_coder.py:48-49). Unlike torch, an inf here
        is not benign: inf corners make NaN IoUs inside the jitted NMS,
        and NaN comparisons silently corrupt the keep set. Only garbage
        (untrained / diverged) predictions are affected."""
        x_c = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        y_c = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        w = bboxes[..., 2] - bboxes[..., 0]
        h = bboxes[..., 3] - bboxes[..., 1]
        xp = (pred_bboxes[..., 0] - 0.5) * stride + x_c
        yp = (pred_bboxes[..., 1] - 0.5) * stride + y_c
        wp = jnp.exp(jnp.clip(pred_bboxes[..., 2], None, 8.0)) * w
        hp = jnp.exp(jnp.clip(pred_bboxes[..., 3], None, 8.0)) * h
        return jnp.stack((xp - wp / 2, yp - hp / 2, xp + wp / 2,
                          yp + hp / 2), axis=-1)


@BBOX_CODERS.register_module()
class TBLRBBoxCoder:
    """Top-Bottom-Left-Right coder (reference tblr_bbox_coder.py, used by
    FSAF): distances from the anchor center to the gt sides, normalized by
    anchor wh * normalizer."""

    def __init__(self, normalizer=4.0, clip_border=True):
        self.normalizer = normalizer
        self.clip_border = clip_border

    def encode(self, bboxes, gt_bboxes):
        cx = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        cy = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        # eps-clamp as in DeltaXYWHBBoxCoder.encode: padded rows must not
        # produce inf/NaN that leak through 0-weight multiplies.
        w = jnp.maximum(bboxes[..., 2] - bboxes[..., 0], 1e-6)
        h = jnp.maximum(bboxes[..., 3] - bboxes[..., 1], 1e-6)
        t = cy - gt_bboxes[..., 1]
        b = gt_bboxes[..., 3] - cy
        l = cx - gt_bboxes[..., 0]
        r = gt_bboxes[..., 2] - cx
        out = jnp.stack([t / h, b / h, l / w, r / w], axis=-1)
        return out / self.normalizer

    def decode(self, bboxes, pred_bboxes, max_shape=None):
        cx = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        cy = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        w = bboxes[..., 2] - bboxes[..., 0]
        h = bboxes[..., 3] - bboxes[..., 1]
        tblr = pred_bboxes * self.normalizer
        t = tblr[..., 0] * h
        b = tblr[..., 1] * h
        l = tblr[..., 2] * w
        r = tblr[..., 3] * w
        x1, y1, x2, y2 = cx - l, cy - t, cx + r, cy + b
        if self.clip_border and max_shape is not None:
            x1 = jnp.clip(x1, 0, max_shape[1])
            y1 = jnp.clip(y1, 0, max_shape[0])
            x2 = jnp.clip(x2, 0, max_shape[1])
            y2 = jnp.clip(y2, 0, max_shape[0])
        return jnp.stack([x1, y1, x2, y2], axis=-1)


def _area(boxes):
    return ((boxes[..., 2] - boxes[..., 0]) *
            (boxes[..., 3] - boxes[..., 1]))


def bbox_overlaps_aligned(bboxes1, bboxes2, mode='iou', eps=1e-6):
    """Element-wise IoU/GIoU between same-shape (..., 4) box arrays.

    Matches reference bbox_overlaps(..., is_aligned=True)
    (iou2d_calculator.py:74).
    """
    lt = jnp.maximum(bboxes1[..., :2], bboxes2[..., :2])
    rb = jnp.minimum(bboxes1[..., 2:], bboxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    overlap = wh[..., 0] * wh[..., 1]
    union = _area(bboxes1) + _area(bboxes2) - overlap
    union = jnp.maximum(union, eps)
    ious = overlap / union
    if mode == 'iou':
        return ious
    if mode == 'iof':
        return overlap / jnp.maximum(_area(bboxes1), eps)
    if mode == 'giou':
        enclose_lt = jnp.minimum(bboxes1[..., :2], bboxes2[..., :2])
        enclose_rb = jnp.maximum(bboxes1[..., 2:], bboxes2[..., 2:])
        enclose_wh = jnp.clip(enclose_rb - enclose_lt, 0, None)
        enclose_area = jnp.maximum(enclose_wh[..., 0] * enclose_wh[..., 1],
                                   eps)
        return ious - (enclose_area - union) / enclose_area
    raise ValueError(f'unknown mode {mode}')


def bbox_overlaps(bboxes1, bboxes2, mode='iou', eps=1e-6):
    """Pairwise IoU/IoF/GIoU: (..., N, 4) x (..., M, 4) -> (..., N, M)."""
    return bbox_overlaps_aligned(bboxes1[..., :, None, :],
                                 bboxes2[..., None, :, :], mode=mode, eps=eps)


def bbox_cxcywh(bboxes):
    """xyxy -> (cx, cy, w, h)."""
    cx = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
    cy = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
    w = bboxes[..., 2] - bboxes[..., 0]
    h = bboxes[..., 3] - bboxes[..., 1]
    return jnp.stack([cx, cy, w, h], axis=-1)


@BBOX_CODERS.register_module()
class BucketingBBoxCoder:
    """Side-aware bucketing coder (reference bucketing_bbox_coder.py):
    each box side is localized by (a) classifying which of ``side_num``
    buckets of the ``scale_factor``-rescaled proposal contains it and (b)
    a fine offset from the bucket center in bucket units.

    encode returns (bucket_labels, cls_weights, offsets, offset_weights)
    each (..., 4, side_num); decode consumes
    (cls_preds, offset_preds) of shape (..., 4*side_num) and also returns
    the top bucket confidence ("bucketing-guided rescoring").
    """

    def __init__(self, num_buckets=14, scale_factor=3.0, offset_topk=2,
                 offset_upperbound=1.0, cls_ignore_neighbor=True):
        self.num_buckets = num_buckets
        self.scale_factor = scale_factor
        self.offset_topk = offset_topk
        self.offset_upperbound = offset_upperbound
        self.cls_ignore_neighbor = cls_ignore_neighbor

    @property
    def side_num(self):
        return int(np.ceil(self.num_buckets / 2.0))

    def _buckets(self, proposals):
        cx = (proposals[..., 0] + proposals[..., 2]) * 0.5
        cy = (proposals[..., 1] + proposals[..., 3]) * 0.5
        w = (proposals[..., 2] - proposals[..., 0]) * self.scale_factor
        h = (proposals[..., 3] - proposals[..., 1]) * self.scale_factor
        px1, px2 = cx - w / 2, cx + w / 2
        py1, py2 = cy - h / 2, cy + h / 2
        bw = w / self.num_buckets
        bh = h / self.num_buckets
        steps = 0.5 + jnp.arange(self.side_num, dtype=jnp.float32)
        l = px1[..., None] + steps * bw[..., None]
        r = px2[..., None] - steps * bw[..., None]
        t = py1[..., None] + steps * bh[..., None]
        d = py2[..., None] - steps * bh[..., None]
        return bw, bh, l, r, t, d

    def encode(self, proposals, gts):
        bw, bh, l, r, t, d = self._buckets(proposals)
        sides = jnp.stack([l, r, t, d], axis=-2)  # (..., 4, S)
        g = jnp.stack([gts[..., 0], gts[..., 2], gts[..., 1], gts[..., 3]],
                      axis=-1)  # (..., 4)
        scale = jnp.stack([bw, bw, bh, bh], axis=-1)  # (..., 4)
        offsets = (sides - g[..., None]) / jnp.maximum(
            scale[..., None], 1e-6)  # (..., 4, S)
        absoff = jnp.abs(offsets)
        # labels: nearest bucket one-hot; weights: topk buckets supervised
        # when within the upperbound (bucketing_bbox_coder.bbox2bucket)
        order = jnp.argsort(absoff, axis=-1)
        nearest = order[..., 0]
        labels = jax.nn.one_hot(nearest, self.side_num)
        rank = jnp.argsort(order, axis=-1)
        # the nearest bucket is always supervised; ranks 1..topk-1 only
        # when THEIR OWN |offset| < upperbound (bbox2bucket:215-233)
        if self.offset_upperbound is not None:
            within = (absoff < self.offset_upperbound).astype(jnp.float32)
        else:
            within = jnp.ones_like(absoff)
        off_w = jnp.where(rank == 0, 1.0,
                          jnp.where(rank < self.offset_topk, within, 0.0))
        # cls ignores EVERY non-best bucket within one bucket width of the
        # gt side, not just the runner-up (bbox2bucket:249-261)
        if self.cls_ignore_neighbor:
            cls_w = 1.0 - ((absoff < 1.0) &
                           (labels == 0)).astype(jnp.float32)
        else:
            cls_w = jnp.ones_like(labels)
        return labels, cls_w, offsets, off_w

    def decode(self, proposals, pred_bboxes, max_shape=None):
        cls_preds, offset_preds = pred_bboxes  # (..., 4*S) each
        S = self.side_num
        shape = cls_preds.shape[:-1] + (4, S)
        scores = jax.nn.softmax(cls_preds.reshape(shape), axis=-1)
        offs = offset_preds.reshape(shape)
        top2, idx2 = jax.lax.top_k(scores, 2)
        best = idx2[..., 0]  # (..., 4)
        bw, bh, l, r, t, d = self._buckets(proposals)
        sides = jnp.stack([l, r, t, d], axis=-2)
        scale = jnp.stack([bw, bw, bh, bh], axis=-1)
        pick_side = jnp.take_along_axis(sides, best[..., None], -1)[..., 0]
        pick_off = jnp.take_along_axis(offs, best[..., None], -1)[..., 0]
        edge = pick_side - pick_off * scale  # (..., 4) = x1, x2, y1, y2
        x1, x2, y1, y2 = edge[..., 0], edge[..., 1], edge[..., 2], edge[..., 3]
        if max_shape is not None:
            x1 = jnp.clip(x1, 0, max_shape[1] - 1)
            x2 = jnp.clip(x2, 0, max_shape[1] - 1)
            y1 = jnp.clip(y1, 0, max_shape[0] - 1)
            y2 = jnp.clip(y2, 0, max_shape[0] - 1)
        boxes = jnp.stack([x1, y1, x2, y2], -1)
        # bucketing-guided rescoring (reference bucket2bbox): top-bucket
        # prob, PLUS the runner-up's when the two top buckets are
        # adjacent (boundary mass split between neighbors)
        adjacent = jnp.abs(idx2[..., 0] - idx2[..., 1]) == 1
        side_conf = top2[..., 0] + jnp.where(adjacent, top2[..., 1], 0.)
        loc_conf = jnp.mean(side_conf, axis=-1)
        return boxes, loc_conf


@BBOX_CODERS.register_module()
class LegacyDeltaXYWHBBoxCoder(DeltaXYWHBBoxCoder):
    """mmdet v1.x delta coder (reference legacy_delta_xywh_bbox_coder.py):
    width/height computed with the legacy +1 convention."""

    def encode(self, bboxes, gt_bboxes):
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = bboxes[..., 2] - bboxes[..., 0] + 1.0
        ph = bboxes[..., 3] - bboxes[..., 1] + 1.0
        gx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) * 0.5
        gy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) * 0.5
        gw = gt_bboxes[..., 2] - gt_bboxes[..., 0] + 1.0
        gh = gt_bboxes[..., 3] - gt_bboxes[..., 1] + 1.0
        deltas = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                            jnp.log(gw / pw), jnp.log(gh / ph)], -1)
        return (deltas - self.means) / self.stds

    def decode(self, bboxes, pred_bboxes, max_shape=None,
               wh_ratio_clip=16 / 1000):
        deltas = pred_bboxes * self.stds + self.means
        max_ratio = abs(float(np.log(wh_ratio_clip)))
        dw = jnp.clip(deltas[..., 2], -max_ratio, max_ratio)
        dh = jnp.clip(deltas[..., 3], -max_ratio, max_ratio)
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = bboxes[..., 2] - bboxes[..., 0] + 1.0
        ph = bboxes[..., 3] - bboxes[..., 1] + 1.0
        gw = pw * jnp.exp(dw)
        gh = ph * jnp.exp(dh)
        gx = px + pw * deltas[..., 0]
        gy = py + ph * deltas[..., 1]
        x1 = gx - (gw - 1) * 0.5
        y1 = gy - (gh - 1) * 0.5
        x2 = gx + (gw - 1) * 0.5
        y2 = gy + (gh - 1) * 0.5
        if max_shape is not None:
            x1 = jnp.clip(x1, 0, max_shape[1] - 1)
            y1 = jnp.clip(y1, 0, max_shape[0] - 1)
            x2 = jnp.clip(x2, 0, max_shape[1] - 1)
            y2 = jnp.clip(y2, 0, max_shape[0] - 1)
        return jnp.stack([x1, y1, x2, y2], -1)


@BBOX_CODERS.register_module()
class PseudoBBoxCoder:
    """Identity coder (reference pseudo_bbox_coder.py)."""

    def encode(self, bboxes, gt_bboxes):
        return gt_bboxes

    def decode(self, bboxes, pred_bboxes, max_shape=None):
        return pred_bboxes
