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
