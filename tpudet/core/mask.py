"""Mask utilities — static gt-frame mask representation.

The reference carries BitmapMasks/PolygonMasks at image resolution through
the pipeline (mmdet/core/mask/structures.py) and crops+resizes them to
28x28 per sampled roi with cv2 (mask_target.py). Static-shape rework:

- each gt mask is rasterized ONCE, in its own bbox frame, at a fixed
  ``gt_frame_size`` (scale-invariant: letterbox/affine moves the box, not
  the box-frame mask), giving a (G, S, S) float tensor per image;
- on device, the 28x28 training target for a roi matched to gt g is an
  axis-aligned resample of that gt-frame mask into the roi frame — two
  tiny matmuls per roi (the same separable-warp trick as the device aug).
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np


def polygons_to_gt_frame_mask(polygons: Sequence[np.ndarray],
                              bbox: np.ndarray,
                              size: int = 56) -> np.ndarray:
    """Rasterize COCO polygon(s) into the gt bbox frame at size x size."""
    import cv2
    x1, y1, x2, y2 = bbox
    w = max(x2 - x1, 1e-3)
    h = max(y2 - y1, 1e-3)
    mask = np.zeros((size, size), np.uint8)
    pts = []
    for poly in polygons:
        p = np.asarray(poly, np.float32).reshape(-1, 2)
        p = (p - [x1, y1]) / [w, h] * size
        pts.append(np.round(p).astype(np.int32))
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask.astype(np.float32)


def mask_targets_from_gt_frame(gt_frame_masks, gt_boxes, rois, out_size=28):
    """Device-side: resample gt-frame masks into roi frames.

    Args:
        gt_frame_masks: (G, S, S) float — masks in their gt-box frames.
        gt_boxes: (G, 4) xyxy. rois: (P, 4) xyxy (each matched to a gt via
            the caller's gather — pass gt_frame_masks/gt_boxes already
            gathered per-roi, i.e. both shaped (P, S, S) / (P, 4)).

    Returns (P, out, out) float targets.
    """
    import jax.numpy as jnp

    s = gt_frame_masks.shape[-1]
    gx1, gy1 = gt_boxes[:, 0], gt_boxes[:, 1]
    gw = jnp.maximum(gt_boxes[:, 2] - gx1, 1e-3)
    gh = jnp.maximum(gt_boxes[:, 3] - gy1, 1e-3)
    rx1, ry1 = rois[:, 0], rois[:, 1]
    rw = jnp.maximum(rois[:, 2] - rx1, 1e-3)
    rh = jnp.maximum(rois[:, 3] - ry1, 1e-3)

    # output pixel o (center (o+.5)/out in roi frame) -> gt-frame coords
    o = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    # image coords of sample rows/cols: (P, out)
    sy = (ry1[:, None] + o[None] * rh[:, None] - gy1[:, None]) / \
        gh[:, None] * s - 0.5
    sx = (rx1[:, None] + o[None] * rw[:, None] - gx1[:, None]) / \
        gw[:, None] * s - 0.5

    cy = jnp.arange(s, dtype=jnp.float32)
    wy = jnp.maximum(0., 1. - jnp.abs(sy[..., None] - cy))  # (P, out, S)
    wx = jnp.maximum(0., 1. - jnp.abs(sx[..., None] - cy))
    tmp = jnp.einsum('poy,pyx->pox', wy, gt_frame_masks)
    return jnp.einsum('pqx,pox->poq', wx, tmp)


# ---------------------------------------------------------------------------
# Inference-side mask output path (reference analogues:
# mmdet/models/roi_heads/mask_heads/fcn_mask_head.py get_seg_masks +
# mmdet/core/mask/utils.py encode_mask_results).
# ---------------------------------------------------------------------------

def segmentation_to_bitmap(segm, height: int, width: int) -> np.ndarray:
    """COCO segmentation (polygon list or RLE dict) -> (H, W) uint8."""
    import cv2
    if segm is None:
        return np.zeros((height, width), np.uint8)
    if isinstance(segm, dict):  # RLE
        return decode_rle(segm)
    mask = np.zeros((height, width), np.uint8)
    pts = [np.round(np.asarray(p, np.float32).reshape(-1, 2)).astype(
        np.int32) for p in segm if len(p) >= 6]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask


def paste_mask_probs(probs: np.ndarray, boxes: np.ndarray, height: int,
                     width: int, thr: float = 0.5) -> np.ndarray:
    """Paste per-detection mask probabilities into the image frame.

    Args:
        probs: (D, s, s) float mask probabilities in each box frame.
        boxes: (D, 4) xyxy in image coordinates.

    Returns (D, H, W) uint8 binary masks (reference fcn_mask_head.py
    get_seg_masks bilinear paste semantics).
    """
    import cv2
    d = probs.shape[0]
    out = np.zeros((d, height, width), np.uint8)
    for i in range(d):
        x1 = int(np.floor(boxes[i, 0]))
        y1 = int(np.floor(boxes[i, 1]))
        x2 = int(np.ceil(boxes[i, 2]))
        y2 = int(np.ceil(boxes[i, 3]))
        x1, y1 = max(x1, 0), max(y1, 0)
        x2, y2 = min(x2, width), min(y2, height)
        w, h = x2 - x1, y2 - y1
        if w <= 0 or h <= 0:
            continue
        m = cv2.resize(probs[i].astype(np.float32), (w, h),
                       interpolation=cv2.INTER_LINEAR)
        out[i, y1:y2, x1:x2] = (m > thr).astype(np.uint8)
    return out


def encode_rle(mask: np.ndarray) -> dict:
    """(H, W) binary -> COCO-style uncompressed RLE (column-major runs,
    counts starting with the 0-run)."""
    h, w = mask.shape
    flat = np.asfortranarray(mask).flatten(order='F').astype(np.uint8)
    if flat.size == 0:
        return dict(size=[h, w], counts=[0])
    change = np.nonzero(np.diff(flat))[0] + 1
    idx = np.concatenate([[0], change, [flat.size]])
    runs = np.diff(idx).tolist()
    if flat[0] == 1:
        runs = [0] + runs
    return dict(size=[h, w], counts=runs)


def decode_rle(rle: dict) -> np.ndarray:
    h, w = rle['size']
    counts = rle['counts']
    if isinstance(counts, (bytes, str)):
        raise ValueError('compressed RLE strings are not produced by '
                         'tpudet; decode with pycocotools')
    flat = np.zeros(h * w, np.uint8)
    pos, val = 0, 0
    for c in counts:
        flat[pos:pos + c] = val
        pos += c
        val = 1 - val
    return flat.reshape((h, w), order='F')


def rle_area(rle: dict) -> int:
    return int(sum(rle['counts'][1::2]))


def mask_iou_matrix(det_masks, gt_masks, gt_crowd=None) -> np.ndarray:
    """IoU between detection and gt masks with COCO crowd semantics
    (crowd gt: union = det area only — same rule as iou_coco).

    Args: lists of (H, W) binary arrays or RLE dicts.
    """
    def as_mask(m):
        return decode_rle(m) if isinstance(m, dict) else m

    dets = [as_mask(m).astype(bool) for m in det_masks]
    gts = [as_mask(m).astype(bool) for m in gt_masks]
    if gt_crowd is None:
        gt_crowd = np.zeros(len(gts), bool)
    ious = np.zeros((len(dets), len(gts)), np.float32)
    for j, g in enumerate(gts):
        g_sum = g.sum()
        for i, d in enumerate(dets):
            inter = np.logical_and(d, g).sum()
            if gt_crowd[j]:
                union = d.sum()
            else:
                union = d.sum() + g_sum - inter
            ious[i, j] = inter / union if union > 0 else 0.0
    return ious
