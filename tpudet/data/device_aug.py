"""On-device fused Mosaic + random-affine + HSV + normalize augmentation.

The reference burns 6 CPU dataloader workers per GPU running
Mosaic -> Albu(pad/crop/scale/crop/flip) -> HSV LUT -> filter -> Normalize
in numpy/cv2 (SURVEY.md §3.1 hot loop (b)). Here the host only decodes and
letterboxes tiles to a fixed size; everything geometric + photometric runs
as ONE jitted XLA program on device:

- the aug chain from the configs
  (configs/yolov4/yolov4l_coco_mosaic.py:31-59: center-pad 1920 ->
  random-crop 1280 -> random-scale 1 +/- 0.5 -> center-crop 640 -> hflip)
  composes with the mosaic paste into a single axis-aligned affine map,
  applied as one bilinear gather — no intermediate canvases beyond the
  2S x 2S mosaic;
- gt boxes ride the same affine, with albumentations-equivalent
  min_area / min_visibility filtering and the GtBBoxesFilter
  (transforms.py:2028-2052) folded into the validity mask;
- HSV gain jitter (transforms.py:1990-2025) as vectorized RGB<->HSV math
  (continuous, not the uint8 LUT quantization);
- normalization (mean 114 / std 255 / to_rgb) fused into the same program.

Inputs are uint8 tiles: 4x less host->device traffic than shipping
normalized float32 images.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp


class AffineParams(NamedTuple):
    """Axis-aligned map out->canvas: x_c = (x_pre + cc) * inv_f + crop - pad
    with optional horizontal pre-flip in output space."""
    inv_f: jnp.ndarray  # 1 / scale factor
    cc: jnp.ndarray  # center-crop offset in scaled coords
    crop_x: jnp.ndarray
    crop_y: jnp.ndarray
    pad: float
    flip: jnp.ndarray  # bool
    out: int

    def out_to_canvas(self, xy_out):
        x = jnp.where(self.flip, self.out - 1.0 - xy_out[..., 0],
                      xy_out[..., 0])
        y = xy_out[..., 1]
        xc = (x + self.cc) * self.inv_f + self.crop_x - self.pad
        yc = (y + self.cc) * self.inv_f + self.crop_y - self.pad
        return jnp.stack([xc, yc], axis=-1)

    def canvas_to_out_boxes(self, boxes):
        """(N, 4) xyxy canvas -> output coords (flip handled)."""
        f = 1.0 / self.inv_f

        def x_out(xc):
            x_pre = (xc + self.pad - self.crop_x) * f - self.cc
            return jnp.where(self.flip, self.out - 1.0 - x_pre, x_pre)

        def y_out(yc):
            return (yc + self.pad - self.crop_y) * f - self.cc

        x1 = x_out(boxes[:, 0])
        x2 = x_out(boxes[:, 2])
        return jnp.stack([
            jnp.minimum(x1, x2),
            y_out(boxes[:, 1]),
            jnp.maximum(x1, x2),
            y_out(boxes[:, 3])
        ], axis=-1)


def sample_affine(key, canvas: int, pad_to: int, crop: int,
                  scale_limit: float, out: int) -> AffineParams:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    padded = max(pad_to, canvas)
    pad = (padded - canvas) // 2
    max_off = padded - crop
    crop_x = jax.random.randint(k1, (), 0, max_off + 1).astype(jnp.float32)
    crop_y = jax.random.randint(k2, (), 0, max_off + 1).astype(jnp.float32)
    f = 1.0 + jax.random.uniform(k3, (), minval=-scale_limit,
                                 maxval=scale_limit)
    cc = (crop * f - out) / 2.0
    flip = jax.random.bernoulli(k4)
    return AffineParams(1.0 / f, cc, crop_x, crop_y, float(pad), flip, out)


def _separable_warp(canvas: jnp.ndarray, src_y: jnp.ndarray,
                    src_x: jnp.ndarray, pad_val: float) -> jnp.ndarray:
    """Axis-aligned bilinear warp as two MXU matmuls.

    The mosaic aug chain is an axis-aligned affine (per-axis scale +
    translation + optional flip), so the bilinear resample is separable:
    ``out = Wy @ canvas @ Wx^T`` with interpolation-weight matrices
    ``W[o, c] = max(0, 1 - |src(o) - c|)``. This replaces ~1.6M scalarized
    XLA gathers per image with two dense matmuls — a ~50x wall-clock win
    on TPU (gathers are the pathological case, matmuls the native one).
    Rows/cols that fall outside the canvas get zero weight; the uncovered
    fraction is filled with ``pad_val`` (albu border_mode=0 constant).

    Args:
        canvas: (H, W, 3) float32.
        src_y: (out_h,) canvas y coordinate of each output row.
        src_x: (out_w,) canvas x coordinate of each output col.
    """
    h, w = canvas.shape[:2]
    cy = jnp.arange(h, dtype=jnp.float32)
    cx = jnp.arange(w, dtype=jnp.float32)
    wy = jnp.maximum(0., 1. - jnp.abs(src_y[:, None] - cy[None, :]))
    wx = jnp.maximum(0., 1. - jnp.abs(src_x[:, None] - cx[None, :]))
    # interp rows: (out_h, W, 3); then cols: (out_h, out_w, 3)
    tmp = jnp.einsum('oy,yxc->oxc', wy, canvas,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum('px,oxc->opc', wx, tmp,
                     preferred_element_type=jnp.float32)
    # coverage-weighted pad fill (weights sum to 1 strictly inside)
    cov = (jnp.sum(wy, axis=1)[:, None] *
           jnp.sum(wx, axis=1)[None, :])[..., None]
    return out + (1. - jnp.clip(cov, 0., 1.)) * pad_val


def _bilinear_gather(canvas: jnp.ndarray, src_xy: jnp.ndarray,
                     pad_val: float) -> jnp.ndarray:
    """canvas (H, W, 3) float; src_xy (h, w, 2); constant-border reads."""
    h, w = canvas.shape[:2]
    x = src_xy[..., 0]
    y = src_xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def read(xi, yi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        return jnp.where(inside[..., None], canvas[yi, xi], pad_val)

    top = read(x0, y0) * (1 - fx) + read(x0 + 1, y0) * fx
    bot = read(x0, y0 + 1) * (1 - fx) + read(x0 + 1, y0 + 1) * fx
    return top * (1 - fy) + bot * fy


def hsv_jitter(img_bgr: jnp.ndarray, key, hue_ratio: float,
               saturation_ratio: float, value_ratio: float) -> jnp.ndarray:
    """HSV gain jitter on float BGR in [0, 255]
    (reference transforms.py:1990-2025 semantics, continuous math)."""
    gains = jax.random.uniform(key, (3,), minval=-1., maxval=1.) * \
        jnp.asarray([hue_ratio, saturation_ratio, value_ratio]) + 1.
    b, g, r = img_bgr[..., 0], img_bgr[..., 1], img_bgr[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    delta = maxc - minc
    v = maxc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-6), 0.) * 255.
    safe = jnp.maximum(delta, 1e-6)
    h = jnp.where(
        maxc == r, (g - b) / safe,
        jnp.where(maxc == g, 2.0 + (b - r) / safe, 4.0 + (r - g) / safe))
    h = (h * 30.0) % 180.0  # OpenCV hue range [0, 180)

    h = (h * gains[0]) % 180.0
    s = jnp.clip(s * gains[1], 0., 255.)
    v = jnp.clip(v * gains[2], 0., 255.)

    h6 = h / 30.0
    i = jnp.floor(h6).astype(jnp.int32) % 6
    f = h6 - jnp.floor(h6)
    sn = s / 255.
    p = v * (1 - sn)
    q = v * (1 - sn * f)
    t = v * (1 - sn * (1 - f))
    sel = [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5]
    r2 = jnp.select(sel, [v, q, p, p, t, v])
    g2 = jnp.select(sel, [t, v, v, q, p, p])
    b2 = jnp.select(sel, [p, p, t, v, v, q])
    return jnp.stack([b2, g2, r2], axis=-1)


@partial(jax.jit, static_argnames=(
    'out_size', 'pad_to', 'crop', 'scale_limit', 'pad_val', 'min_area',
    'min_visibility', 'min_size', 'max_aspect_ratio', 'hue_ratio',
    'saturation_ratio', 'value_ratio'))
def device_mosaic_affine(tiles: jnp.ndarray,
                         tile_hw: jnp.ndarray,
                         gt_bboxes: jnp.ndarray,
                         gt_valid: jnp.ndarray,
                         gt_labels: jnp.ndarray,
                         rng: jax.Array,
                         out_size: int = 640,
                         pad_to: int = 1920,
                         crop: int = 1280,
                         scale_limit: float = 0.5,
                         pad_val: float = 114.,
                         min_area: float = 4.,
                         min_visibility: float = 0.2,
                         min_size: float = 2.,
                         max_aspect_ratio: float = 20.,
                         hue_ratio: float = 0.015,
                         saturation_ratio: float = 0.7,
                         value_ratio: float = 0.4) -> Dict[str, jnp.ndarray]:
    """Fused mosaic + affine + HSV + normalize for a batch.

    Args:
        tiles: (B, 4, S, S, 3) uint8 BGR letterboxed tiles (zero-padded;
            real content occupies tile_hw).
        tile_hw: (B, 4, 2) int32 (h, w) of each tile's content.
        gt_bboxes: (B, 4, G, 4) per-tile gt boxes (tile coords, xyxy).
        gt_valid: (B, 4, G) bool.
        gt_labels: (B, 4, G) int32.
        rng: PRNG key.

    Returns:
        dict(img (B, out, out, 3) float32 RGB normalized,
             gt_bboxes (B, 4*G, 4), gt_labels (B, 4*G), gt_valid (B, 4*G)).
    """
    s = tiles.shape[2]

    def one(tiles_i, hw_i, boxes_i, valid_i, labels_i, key):
        k_aff, k_hsv = jax.random.split(key)

        # mosaic paste around canvas center (transforms.py:1942-1952):
        # quadrant q's inner corner anchors at (s, s)
        canvas = jnp.full((2 * s, 2 * s, 3), pad_val, jnp.float32)
        box_offsets = []
        for q in range(4):
            h_q, w_q = hw_i[q, 0], hw_i[q, 1]
            x1 = jnp.where(q % 2 == 0, s - w_q, s)
            y1 = jnp.where(q < 2, s - h_q, s)
            box_offsets.append((x1, y1))
            tile = tiles_i[q].astype(jnp.float32)
            yy = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
            xx = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
            inside = ((yy < h_q) & (xx < w_q))[..., None]
            tile = jnp.where(inside, tile, pad_val)
            canvas = jax.lax.dynamic_update_slice(
                canvas, tile, (jnp.clip(y1, 0, s), jnp.clip(x1, 0, s), 0))

        aff = sample_affine(k_aff, 2 * s, pad_to, crop, scale_limit,
                            out_size)
        # the affine is axis-aligned and separable: source coordinates per
        # output row / column, warped with two MXU matmuls
        rng_out = jnp.arange(out_size, dtype=jnp.float32)
        src = aff.out_to_canvas(
            jnp.stack([rng_out, rng_out], axis=-1))  # (out, 2)
        src_x = src[:, 0]
        src_y = src[:, 1]
        img = _separable_warp(canvas, src_y, src_x, pad_val)
        img = hsv_jitter(img, k_hsv, hue_ratio, saturation_ratio,
                         value_ratio)

        # boxes: tile coords -> canvas coords -> output coords
        shifted = []
        for q in range(4):
            x1, y1 = box_offsets[q]
            off = jnp.stack([x1, y1, x1, y1]).astype(jnp.float32)
            shifted.append(boxes_i[q] + off[None, :])
        cboxes = jnp.concatenate(shifted, axis=0)  # (4G, 4)
        cvalid = valid_i.reshape(-1)
        clabels = labels_i.reshape(-1)

        out_boxes = aff.canvas_to_out_boxes(cboxes)
        area0 = ((cboxes[:, 2] - cboxes[:, 0]) *
                 (cboxes[:, 3] - cboxes[:, 1]) / float(4 * s * s))
        clipped = jnp.clip(out_boxes, 0., float(out_size))
        w = clipped[:, 2] - clipped[:, 0]
        h = clipped[:, 3] - clipped[:, 1]
        area = w * h
        vis = (area / float(out_size * out_size)) / jnp.maximum(area0, 1e-12)
        ar = jnp.maximum(w / (h + 1e-16), h / (w + 1e-16))
        keep = (cvalid & (area >= min_area) & (vis >= min_visibility)
                & (w > min_size) & (h > min_size) & (ar < max_aspect_ratio))

        img = (img[..., ::-1] - 114.0) / 255.0  # BGR->RGB, normalize
        return img, clipped, clabels, keep

    # per-image SIGNED int seeds (loader convention) vs a single PRNG key
    # (raw keys are uint32 (2,), typed keys have a key dtype)
    if jnp.issubdtype(jnp.asarray(rng).dtype, jnp.signedinteger) and \
            jnp.asarray(rng).ndim == 1:
        keys = jax.vmap(
            lambda s: jax.random.fold_in(jax.random.PRNGKey(0), s))(rng)
    else:
        keys = jax.random.split(rng, tiles.shape[0])
    img, boxes, labels, valid = jax.vmap(one)(
        tiles, tile_hw, gt_bboxes, gt_valid, gt_labels, keys)
    return dict(img=img, gt_bboxes=boxes, gt_labels=labels, gt_valid=valid)
