"""Anchor generators — precomputed static grids.

TPU-native reading of the reference's anchor machinery
(reference: mmdet/core/anchor/anchor_generator.py:10,595,
mmdet/core/anchor/yolov4_anchor_generator.py:8): anchors depend only on
static feature-map shapes, so they are computed once in numpy and folded
into jitted programs as constants — no device-side grid generation, no
`.to(device)` traffic.

Conventions match the reference exactly:
- base anchors are xyxy around a per-level center (stride/2 for YOLO)
- grid anchors are base anchors shifted by (x*stride_w, y*stride_h),
  enumerated row-major with the base-anchor axis fastest
  (reference: anchor_generator.py:262-269)
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np

from ..registry import ANCHOR_GENERATORS, build_from_cfg


def _pair(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


def build_anchor_generator(cfg, **default_args):
    return build_from_cfg(cfg, ANCHOR_GENERATORS, default_args or None)


@ANCHOR_GENERATORS.register_module()
class AnchorGenerator:
    """Standard multi-level anchor generator (RetinaNet-style).

    Mirrors reference mmdet/core/anchor/anchor_generator.py:10 semantics:
    ``base_sizes`` default to min(stride); scales come either from ``scales``
    or ``octave_base_scale``/``scales_per_octave``; ratios are h/w;
    ``center_offset`` defaults to 0 (anchor centered on the grid corner).
    """

    def __init__(self,
                 strides,
                 ratios,
                 scales=None,
                 base_sizes=None,
                 scale_major=True,
                 octave_base_scale=None,
                 scales_per_octave=None,
                 centers=None,
                 center_offset=0.):
        if center_offset != 0:
            assert centers is None
        assert 0 <= center_offset <= 1
        self.strides = [_pair(s) for s in strides]
        self.base_sizes = ([min(s) for s in self.strides]
                           if base_sizes is None else list(base_sizes))
        assert len(self.base_sizes) == len(self.strides)

        assert ((octave_base_scale is not None
                 and scales_per_octave is not None) ^ (scales is not None))
        if scales is not None:
            self.scales = np.asarray(scales, dtype=np.float32)
        else:
            octave_scales = np.array(
                [2**(i / scales_per_octave) for i in range(scales_per_octave)])
            self.scales = (octave_scales * octave_base_scale).astype(
                np.float32)
        self.octave_base_scale = octave_base_scale
        self.scales_per_octave = scales_per_octave
        self.ratios = np.asarray(ratios, dtype=np.float32)
        self.scale_major = scale_major
        self.centers = centers
        self.center_offset = center_offset
        self.base_anchors = self.gen_base_anchors()

    @property
    def num_base_anchors(self) -> List[int]:
        return [a.shape[0] for a in self.base_anchors]

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    def gen_base_anchors(self) -> List[np.ndarray]:
        out = []
        for i, base_size in enumerate(self.base_sizes):
            center = self.centers[i] if self.centers is not None else None
            out.append(
                self._single_level_base_anchors(base_size, self.scales,
                                                self.ratios, center))
        return out

    def _single_level_base_anchors(self, base_size, scales, ratios,
                                   center=None) -> np.ndarray:
        w = h = float(base_size)
        if center is None:
            x_center = self.center_offset * w
            y_center = self.center_offset * h
        else:
            x_center, y_center = center
        h_ratios = np.sqrt(ratios)
        w_ratios = 1.0 / h_ratios
        if self.scale_major:
            ws = (w * w_ratios[:, None] * scales[None, :]).reshape(-1)
            hs = (h * h_ratios[:, None] * scales[None, :]).reshape(-1)
        else:
            ws = (w * scales[:, None] * w_ratios[None, :]).reshape(-1)
            hs = (h * scales[:, None] * h_ratios[None, :]).reshape(-1)
        return np.stack([
            x_center - 0.5 * ws, y_center - 0.5 * hs, x_center + 0.5 * ws,
            y_center + 0.5 * hs
        ], axis=-1).astype(np.float32)

    def grid_anchors(
            self, featmap_sizes: Sequence[Tuple[int, int]]) -> List[np.ndarray]:
        """Anchors per level, shape (H*W*A, 4), row-major, A fastest."""
        assert len(featmap_sizes) == self.num_levels
        return [
            self._single_level_grid_anchors(self.base_anchors[i],
                                            featmap_sizes[i], self.strides[i])
            for i in range(self.num_levels)
        ]

    @staticmethod
    def _single_level_grid_anchors(base_anchors, featmap_size,
                                   stride) -> np.ndarray:
        feat_h, feat_w = featmap_size
        shift_x = np.arange(0, feat_w, dtype=np.float32) * stride[0]
        shift_y = np.arange(0, feat_h, dtype=np.float32) * stride[1]
        xx = np.tile(shift_x, feat_h)
        yy = np.repeat(shift_y, feat_w)
        shifts = np.stack([xx, yy, xx, yy], axis=-1)
        all_anchors = base_anchors[None, :, :] + shifts[:, None, :]
        return all_anchors.reshape(-1, 4).astype(np.float32)

    def valid_flags(self, featmap_sizes, pad_shape) -> List[np.ndarray]:
        """Validity of each anchor vs padded image shape (H, W)."""
        out = []
        for i in range(self.num_levels):
            feat_h, feat_w = featmap_sizes[i]
            h, w = pad_shape[:2]
            valid_h = min(int(math.ceil(h / self.strides[i][1])), feat_h)
            valid_w = min(int(math.ceil(w / self.strides[i][0])), feat_w)
            vx = np.zeros(feat_w, dtype=bool)
            vy = np.zeros(feat_h, dtype=bool)
            vx[:valid_w] = True
            vy[:valid_h] = True
            valid = (vy[:, None] & vx[None, :]).reshape(-1)
            out.append(np.repeat(valid, self.num_base_anchors[i]))
        return out


@ANCHOR_GENERATORS.register_module()
class SSDAnchorGenerator(AnchorGenerator):
    """SSD anchor generator (reference anchor_generator.py:350-465):
    per-level min/max sizes derived from ``basesize_ratio_range``, scales
    [1, sqrt(max/min)], ratios [1, 1/r, r, ...], the sqrt(max/min)-scale
    square anchor reordered to slot 1."""

    def __init__(self, strides, ratios, basesize_ratio_range,
                 input_size=300, scale_major=True):
        assert len(strides) == len(ratios)
        self.strides = [_pair(s) for s in strides]
        self.input_size = input_size
        self.centers = [(s[0] / 2., s[1] / 2.) for s in self.strides]
        self.basesize_ratio_range = basesize_ratio_range

        min_ratio, max_ratio = basesize_ratio_range
        min_ratio = int(min_ratio * 100)
        max_ratio = int(max_ratio * 100)
        step = int(np.floor(max_ratio - min_ratio) / (self.num_levels - 2))
        min_sizes, max_sizes = [], []
        for ratio in range(min_ratio, max_ratio + 1, step):
            min_sizes.append(int(input_size * ratio / 100))
            max_sizes.append(int(input_size * (ratio + step) / 100))
        first = {  # (input_size, min_ratio_percent) -> head sizes
            (300, 15): (7, 15), (300, 20): (10, 20),
            (512, 10): (4, 10), (512, 15): (7, 15),
        }.get((input_size, min_ratio))
        if first is None:
            raise ValueError(
                f'unsupported SSD config ({input_size}, {min_ratio / 100})')
        min_sizes.insert(0, int(input_size * first[0] / 100))
        max_sizes.insert(0, int(input_size * first[1] / 100))

        self.base_sizes = min_sizes
        self.scales = []
        self.ratios = []
        for k in range(len(self.strides)):
            self.scales.append(
                np.array([1., np.sqrt(max_sizes[k] / min_sizes[k])],
                         np.float32))
            anchor_ratio = [1.]
            for r in ratios[k]:
                anchor_ratio += [1 / r, r]
            self.ratios.append(np.array(anchor_ratio, np.float32))
        self.scale_major = scale_major
        self.center_offset = 0
        self.base_anchors = self.gen_base_anchors()

    @property
    def num_levels(self):
        return len(self.strides)

    def gen_base_anchors(self) -> List[np.ndarray]:
        out = []
        for i, base_size in enumerate(self.base_sizes):
            anchors = self._single_level_base_anchors(
                base_size, self.scales[i], self.ratios[i], self.centers[i])
            # move the big square anchor (last row) to slot 1 (:449-453)
            indices = list(range(len(self.ratios[i])))
            indices.insert(1, len(indices))
            out.append(anchors[indices])
        return out


@ANCHOR_GENERATORS.register_module()
class YOLOAnchorGenerator(AnchorGenerator):
    """YOLO anchor generator: explicit per-level (w, h) base sizes, centers
    at stride/2 (reference: anchor_generator.py:595-660)."""

    def __init__(self, strides, base_sizes):
        self.strides = [_pair(s) for s in strides]
        self.centers = [(s[0] / 2., s[1] / 2.) for s in self.strides]
        self.base_sizes = []
        num_anchor_per_level = len(base_sizes[0])
        for per_level in base_sizes:
            assert num_anchor_per_level == len(per_level)
            self.base_sizes.append([_pair(b) for b in per_level])
        self.base_anchors = self.gen_base_anchors()

    @property
    def num_levels(self):
        return len(self.base_sizes)

    def gen_base_anchors(self) -> List[np.ndarray]:
        out = []
        for i, per_level in enumerate(self.base_sizes):
            cx, cy = self.centers[i]
            anchors = np.array([[cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w,
                                 cy + 0.5 * h] for (w, h) in per_level],
                               dtype=np.float32)
            out.append(anchors)
        return out

    def base_anchor_wh(self) -> List[np.ndarray]:
        """(A, 2) widths/heights of base anchors per level."""
        return [
            np.stack([a[:, 2] - a[:, 0], a[:, 3] - a[:, 1]], axis=-1)
            for a in self.base_anchors
        ]

    def responsible_flags(self, featmap_sizes, gt_bboxes) -> List[np.ndarray]:
        """YOLOv3-style single-cell responsibility flags
        (reference: anchor_generator.py:667-727). numpy, host-side."""
        assert self.num_levels == len(featmap_sizes)
        out = []
        for i in range(self.num_levels):
            feat_h, feat_w = featmap_sizes[i]
            sx, sy = self.strides[i]
            cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) * 0.5
            cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) * 0.5
            gx = np.floor(cx / sx).astype(np.int64)
            gy = np.floor(cy / sy).astype(np.int64)
            idx = gy * feat_w + gx
            grid = np.zeros(feat_h * feat_w, dtype=bool)
            grid[idx] = True
            out.append(np.repeat(grid, self.num_base_anchors[i]))
        return out


@ANCHOR_GENERATORS.register_module()
class YOLOV4AnchorGenerator(YOLOAnchorGenerator):
    """YOLOv4/v5 anchor generator.

    The reference adds ``responsible_indices`` — shape-match + neighbor-cell
    assignment returning variable-length (img, anchor, gt) triples
    (reference: yolov4_anchor_generator.py:12-134). On TPU that becomes the
    dense, shape-static match computation in
    :func:`tpudet.core.targets.responsible_matches`; this class carries the
    static data (base anchor w/h, strides) that function needs.
    """
