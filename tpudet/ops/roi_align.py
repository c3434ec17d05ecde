"""RoIAlign as a pure-XLA gather kernel.

The reference's two-stage path depends on mmcv's CUDA RoIAlign
(SURVEY.md §2.1: "mmcv RoIAlign/RoIPool/... two-stage ops"). On TPU the
same computation is a batched bilinear gather with static shapes: every
roi contributes ``out_size^2 * sampling_ratio^2`` sample points, each read
with 4-neighbor bilinear interpolation; out-of-image reads return 0.

Semantics follow mmcv RoIAlign(aligned=True): sample coordinates are
``roi_start + (i + 0.5) * bin / n - 0.5`` in feature-map pixels.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=('out_size', 'sampling_ratio',
                                   'spatial_scale'))
def roi_align(feat: jax.Array,
              rois: jax.Array,
              out_size: int = 7,
              spatial_scale: float = 1.0,
              sampling_ratio: int = 2) -> jax.Array:
    """Single feature map. feat (H, W, C); rois (P, 4) xyxy in image
    coords. Returns (P, out_size, out_size, C)."""
    h, w, _ = feat.shape
    boxes = rois * spatial_scale
    x1, y1 = boxes[:, 0], boxes[:, 1]
    roi_w = jnp.maximum(boxes[:, 2] - x1, 1e-3)
    roi_h = jnp.maximum(boxes[:, 3] - y1, 1e-3)
    n = sampling_ratio

    # per-axis sample coordinates: (P, out*n)
    grid = (jnp.arange(out_size * n, dtype=jnp.float32) + 0.5) / n
    ys = y1[:, None] + grid[None, :] * (roi_h / out_size)[:, None] - 0.5
    xs = x1[:, None] + grid[None, :] * (roi_w / out_size)[:, None] - 0.5

    # full sample grid (P, out*n, out*n)
    yy = ys[:, :, None]
    xx = xs[:, None, :]
    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    fy = jnp.broadcast_to(yy - y0, (ys.shape[0], ys.shape[1],
                                    xs.shape[1]))[..., None]
    fx = jnp.broadcast_to(xx - x0, fy.shape[:-1])[..., None]

    def read(yi, xi):
        yi = jnp.broadcast_to(yi, fy.shape[:-1])
        xi = jnp.broadcast_to(xi, fy.shape[:-1])
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        xc = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        vals = feat[yc, xc]  # gather -> (..., C)
        return jnp.where(inside[..., None], vals, 0.)

    top = read(y0, x0) * (1 - fx) + read(y0, x0 + 1) * fx
    bot = read(y0 + 1, x0) * (1 - fx) + read(y0 + 1, x0 + 1) * fx
    samples = top * (1 - fy) + bot * fy  # (P, out*n, out*n, C)

    p = rois.shape[0]
    c = feat.shape[-1]
    samples = samples.reshape(p, out_size, n, out_size, n, c)
    return jnp.mean(samples, axis=(2, 4))


def multilevel_roi_align(feats, rois, roi_valid, out_size: int = 7,
                         strides=(4, 8, 16, 32), sampling_ratio: int = 2,
                         finest_scale: int = 56):
    """FPN RoIAlign with mmcv SingleRoIExtractor level mapping
    (reference roi_heads/roi_extractors/single_level_roi_extractor.py):
    level = floor(log2(sqrt(area) / finest_scale + 1e-6)) clamped.

    Shape-static: every roi is extracted from EVERY level, then the right
    level is selected by mask — num_levels x the gather work, zero dynamic
    shapes.

    Args:
        feats: list of (H_l, W_l, C) maps (single image).
        rois: (P, 4) xyxy image coords; roi_valid: (P,) bool.
    """
    num_levels = len(feats)
    areas = jnp.maximum((rois[:, 2] - rois[:, 0]) *
                        (rois[:, 3] - rois[:, 1]), 1e-6)
    target = jnp.floor(jnp.log2(jnp.sqrt(areas) / finest_scale + 1e-6))
    target = jnp.clip(target, 0, num_levels - 1).astype(jnp.int32)

    out = 0.
    for lvl in range(num_levels):
        pooled = roi_align(feats[lvl], rois, out_size=out_size,
                           spatial_scale=1.0 / strides[lvl],
                           sampling_ratio=sampling_ratio)
        mask = (target == lvl) & roi_valid
        out = out + pooled * mask[:, None, None, None]
    return out


def generic_roi_align(feats, rois, roi_valid, out_size: int = 7,
                      strides=(4, 8, 16, 32), sampling_ratio: int = 2,
                      aggregation: str = 'sum'):
    """GenericRoIExtractor (reference roi_heads/roi_extractors/
    generic_roi_extractor.py): pool EVERY level for every roi and
    aggregate by 'sum' or 'concat' (instead of SingleRoIExtractor's
    scale-based level selection).

    Args/returns like :func:`multilevel_roi_align`; 'concat' returns
    (P, out, out, C * num_levels).
    """
    pooled = [
        roi_align(feats[lvl], rois, out_size=out_size,
                  spatial_scale=1.0 / strides[lvl],
                  sampling_ratio=sampling_ratio)
        for lvl in range(len(strides))
    ]
    import jax.numpy as jnp
    if aggregation == 'concat':
        out = jnp.concatenate(pooled, axis=-1)
    else:
        out = sum(pooled)
    return out * roi_valid[:, None, None, None]
