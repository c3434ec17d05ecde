"""Dense, shape-static YOLOv4/v5 target assignment.

The reference's ``YOLOV4AnchorGenerator.responsible_indices``
(mmdet/core/anchor/yolov4_anchor_generator.py:12-134) returns
variable-length (img, anchor, gt) index triples: shape-match between gt and
base anchors, then neighbor-cell expansion with ``xy % 1 < 0.5`` validity.
Dynamic shapes don't compile on TPU, so here the same assignment is a dense
computation over a padded gt tensor: every (gt, base-anchor, offset) slot
gets a flat anchor index and a boolean match flag. The loss then runs over
all slots with masking — identical math, XLA-friendly shapes.

Capacity is exact, not a heuristic: a gt matches at most ``A`` base anchors
x ``(1 + neighbors)`` cells per level, so the slot tensor covers every match
the reference could emit (duplicate (anchor, gt) pairs included, which the
reference also keeps and which each contribute to the loss mean).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

# offset order matches reference yolov4_anchor_generator.py:55-63
_NEIGHBOR_OFFSETS = np.array(
    [[0, 0], [-1, 0], [0, -1], [1, 0], [0, 1],
     [-1, -1], [1, -1], [1, 1], [-1, 1]], dtype=np.float32)


class LevelMatches(NamedTuple):
    """Per-level padded matches. Leading dims: (B, G, A, O)."""
    anchor_idx: jnp.ndarray  # int32 flat index into H*W*A anchors
    mask: jnp.ndarray  # bool — slot is a real match


def responsible_matches(gt_bboxes: jnp.ndarray,
                        gt_valid: jnp.ndarray,
                        featmap_size: Tuple[int, int],
                        stride: float,
                        base_anchor_wh: np.ndarray,
                        neighbor: int = 2,
                        shape_match_thres: float = 4.0) -> LevelMatches:
    """Single-level dense equivalent of ``responsible_indices``.

    Args:
        gt_bboxes: (B, G, 4) xyxy, zero-padded.
        gt_valid: (B, G) bool mask of real gts.
        featmap_size: (H, W) static.
        stride: level stride (square strides, as all reference configs use).
        base_anchor_wh: (A, 2) static numpy widths/heights of base anchors.
        neighbor: 0 (center cell only), 2 (yolov5-style 2-nearest, the
            assigner-free default: yolocsp_head.py:421), or 3 (all 8).
        shape_match_thres: wh-ratio max deviation bound (default 4.0).

    Returns:
        LevelMatches with (B, G, A, O) tensors, O = 1/5/9 offsets.
    """
    feat_h, feat_w = featmap_size
    num_anchors = base_anchor_wh.shape[0]

    gt_xy = (gt_bboxes[..., 2:4] + gt_bboxes[..., 0:2]) * 0.5  # (B, G, 2)
    gt_wh = gt_bboxes[..., 2:4] - gt_bboxes[..., 0:2]

    # shape match: max(wh_ratio, 1/wh_ratio) over w and h < thres
    # (reference :75-78). eps guards padded zero-size gts (masked anyway).
    anchor_wh = jnp.asarray(base_anchor_wh)  # (A, 2)
    ratio = gt_wh[..., None, :] / anchor_wh  # (B, G, A, 2)
    deviation = jnp.maximum(ratio, 1.0 / jnp.maximum(ratio, 1e-9))
    deviation = jnp.max(deviation, axis=-1)  # (B, G, A)
    shape_match = (deviation < shape_match_thres) & gt_valid[..., None]

    xy_grid = gt_xy / stride  # (B, G, 2)
    xy_grid_inv = jnp.asarray([feat_w, feat_h], jnp.float32) - xy_grid

    # neighbor-cell validity (reference :90-122)
    x_left_ok = (xy_grid[..., 0] % 1.0 < 0.5) & (xy_grid[..., 0] > 1.0)
    y_up_ok = (xy_grid[..., 1] % 1.0 < 0.5) & (xy_grid[..., 1] > 1.0)
    x_right_ok = (xy_grid_inv[..., 0] % 1.0 < 0.5) & (xy_grid_inv[..., 0] > 1.0)
    y_down_ok = (xy_grid_inv[..., 1] % 1.0 < 0.5) & (xy_grid_inv[..., 1] > 1.0)
    ones = jnp.ones_like(x_left_ok)

    if neighbor == 0:
        neighbor_ok = ones[..., None]  # (B, G, 1)
    elif neighbor == 2:
        neighbor_ok = jnp.stack(
            [ones, x_left_ok, y_up_ok, x_right_ok, y_down_ok], axis=-1)
    elif neighbor == 3:
        neighbor_ok = jnp.stack([
            ones, x_left_ok, y_up_ok, x_right_ok, y_down_ok,
            x_left_ok & y_up_ok, x_right_ok & y_up_ok,
            x_right_ok & y_down_ok, x_left_ok & y_down_ok
        ], axis=-1)
    else:
        raise NotImplementedError(f'neighbor={neighbor}')
    num_offsets = neighbor_ok.shape[-1]
    offsets = jnp.asarray(_NEIGHBOR_OFFSETS[:num_offsets])  # (O, 2)

    # cell coordinates per offset (reference :128-130 truncates with .long();
    # all valid coordinates are >= 0 so floor == trunc)
    cell_xy = jnp.floor(xy_grid[..., None, :] + offsets)  # (B, G, O, 2)
    cell_x = jnp.clip(cell_xy[..., 0].astype(jnp.int32), 0, feat_w - 1)
    cell_y = jnp.clip(cell_xy[..., 1].astype(jnp.int32), 0, feat_h - 1)
    cell_flat = cell_y * feat_w + cell_x  # (B, G, O)

    # flat anchor index: row-major cells, base-anchor axis fastest
    # (reference :88,130)
    anchor_idx = (cell_flat[..., None, :] * num_anchors +
                  jnp.arange(num_anchors, dtype=jnp.int32)[:, None])
    mask = shape_match[..., None] & neighbor_ok[..., None, :]  # (B, G, A, O)
    return LevelMatches(anchor_idx.astype(jnp.int32), mask)


def multilevel_responsible_matches(gt_bboxes, gt_valid, featmap_sizes,
                                   strides: Sequence[float],
                                   base_anchor_whs: Sequence[np.ndarray],
                                   neighbor: int = 2,
                                   shape_match_thres: float = 4.0):
    """All levels; returns list[LevelMatches]."""
    return [
        responsible_matches(gt_bboxes, gt_valid, featmap_sizes[i],
                            strides[i], base_anchor_whs[i], neighbor,
                            shape_match_thres)
        for i in range(len(featmap_sizes))
    ]
