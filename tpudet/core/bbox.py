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
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = bboxes[..., 2] - bboxes[..., 0]
        ph = bboxes[..., 3] - bboxes[..., 1]
        gx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) * 0.5
        gy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) * 0.5
        gw = gt_bboxes[..., 2] - gt_bboxes[..., 0]
        gh = gt_bboxes[..., 3] - gt_bboxes[..., 1]
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
        """pred xy already sigmoided to (0,1); wh raw log-scale."""
        x_c = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        y_c = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        w = bboxes[..., 2] - bboxes[..., 0]
        h = bboxes[..., 3] - bboxes[..., 1]
        xp = (pred_bboxes[..., 0] - 0.5) * stride + x_c
        yp = (pred_bboxes[..., 1] - 0.5) * stride + y_c
        wp = jnp.exp(pred_bboxes[..., 2]) * w
        hp = jnp.exp(pred_bboxes[..., 3]) * h
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
        w = bboxes[..., 2] - bboxes[..., 0]
        h = bboxes[..., 3] - bboxes[..., 1]
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
