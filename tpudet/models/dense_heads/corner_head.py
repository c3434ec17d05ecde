"""CornerNet head (reference mmdet/models/dense_heads/corner_head.py:81).

Keypoint-based detection, shape-static:
- corner pooling as directional running maxima — ``lax.cummax`` along the
  flipped axis (the mmcv CUDA CornerPool kernel's semantics) instead of a
  scalar scan;
- dense gaussian heatmap targets: per padded gt a truncated gaussian at
  the corner cell (radius from ``gaussian_radius`` min_overlap=0.3,
  reference gaussian_target.py), max-composed over gts;
- losses: gaussian focal on heatmaps (avg by num corners), associative
  embedding pull/push at gt corner cells, smooth-L1 corner offsets at
  corner cells only (corner_head.py:570-647);
- decode: 3x3 local-max suppression, per-heatmap top-k corners, all tl x br
  pairs scored (mean corner score), invalidated by class mismatch,
  embedding distance > dist_thr, or inverted geometry; top num_dets pairs
  then soft-NMS (corner_head.py:874-1084).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.nms import NMSResult, soft_nms_padded
from ...registry import HEADS
from .. import losses as L
from ..layers import BN_EPS


def corner_pool(x, direction: str):
    """Directional running max over the feature map (NHWC).

    'top': each cell sees the max of itself and everything below;
    'bottom': above; 'left': right; 'right': left — matching mmcv
    CornerPool.
    """
    if direction == 'top':
        return jnp.flip(jax.lax.cummax(jnp.flip(x, 1), axis=1), 1)
    if direction == 'bottom':
        return jax.lax.cummax(x, axis=1)
    if direction == 'left':
        return jnp.flip(jax.lax.cummax(jnp.flip(x, 2), axis=2), 2)
    if direction == 'right':
        return jax.lax.cummax(x, axis=2)
    raise ValueError(direction)


def gaussian_radius(height, width, min_overlap=0.3):
    """reference mmdet/models/utils/gaussian_target.py:gaussian_radius —
    the three quadratic cases, returning the minimum radius."""
    a1 = 1
    b1 = (height + width)
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.clip(b1**2 - 4 * a1 * c1, 0, None))
    r1 = (b1 - sq1) / (2 * a1)

    a2 = 4
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.clip(b2**2 - 4 * a2 * c2, 0, None))
    r2 = (b2 - sq2) / (2 * a2)

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.clip(b3**2 - 4 * a3 * c3, 0, None))
    r3 = (b3 + sq3) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


class BiCornerPool(nn.Module):
    """reference corner_head.py:17-79."""
    out_channels: int
    directions: Tuple[str, str]
    feat_channels: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def cbr(f, k, name, act=True):
            def run(v):
                v = nn.Conv(f, (k, k), padding='SAME', use_bias=False,
                            dtype=self.dtype,
                            kernel_init=nn.initializers.he_normal(),
                            name=f'{name}_conv')(v)
                v = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=BN_EPS, dtype=self.dtype,
                                 name=f'{name}_bn')(v)
                return nn.relu(v) if act else v
            return run

        d1 = corner_pool(cbr(self.feat_channels, 3, 'direction1')(x),
                         self.directions[0])
        d2 = corner_pool(cbr(self.feat_channels, 3, 'direction2')(x),
                         self.directions[1])
        aft = cbr(self.out_channels, 3, 'aftpool', act=False)(d1 + d2)
        c1 = cbr(self.out_channels, 1, 'conv1', act=False)(x)
        return cbr(self.out_channels, 3, 'conv2')(nn.relu(aft + c1))


class _PredBranch(nn.Module):
    """ConvModule(3x3, no norm) + 1x1 prediction conv
    (corner_head.py:153-158)."""
    out_channels: int
    feat_channels: int = 256
    bias_init: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.feat_channels, (3, 3), padding='SAME',
                    use_bias=True, dtype=self.dtype,
                    kernel_init=nn.initializers.he_normal(), name='conv')(x)
        x = nn.relu(x)
        return nn.Conv(self.out_channels, (1, 1), use_bias=True,
                       dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       bias_init=nn.initializers.constant(self.bias_init),
                       name='pred')(x)


@HEADS.register_module()
class CornerHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    num_feat_levels: int = 2  # hourglass stacks
    corner_emb_channels: int = 1
    # loss weights (reference configs/cornernet)
    pull_weight: float = 0.1
    push_weight: float = 0.1
    offset_weight: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # heatmap bias: prior prob 0.1 (corner_head.py:225-241)
        hm_bias = float(-math.log((1 - 0.1) / 0.1))
        outs = {k: [] for k in ('tl_heat', 'br_heat', 'tl_emb', 'br_emb',
                                'tl_off', 'br_off')}
        for i, x in enumerate(feats):
            tl = BiCornerPool(self.in_channels, ('top', 'left'),
                              dtype=self.dtype, name=f'tl_pool{i}')(x, train)
            br = BiCornerPool(self.in_channels, ('bottom', 'right'),
                              dtype=self.dtype, name=f'br_pool{i}')(x, train)
            outs['tl_heat'].append(
                _PredBranch(self.num_classes, bias_init=hm_bias,
                            dtype=self.dtype, name=f'tl_heat{i}')(tl))
            outs['br_heat'].append(
                _PredBranch(self.num_classes, bias_init=hm_bias,
                            dtype=self.dtype, name=f'br_heat{i}')(br))
            outs['tl_emb'].append(
                _PredBranch(self.corner_emb_channels, dtype=self.dtype,
                            name=f'tl_emb{i}')(tl))
            outs['br_emb'].append(
                _PredBranch(self.corner_emb_channels, dtype=self.dtype,
                            name=f'br_emb{i}')(br))
            outs['tl_off'].append(
                _PredBranch(2, dtype=self.dtype, name=f'tl_off{i}')(tl))
            outs['br_off'].append(
                _PredBranch(2, dtype=self.dtype, name=f'br_off{i}')(br))
        return tuple(tuple(outs[k]) for k in
                     ('tl_heat', 'br_heat', 'tl_emb', 'br_emb', 'tl_off',
                      'br_off'))

    # ------------------------------------------------------------------
    def _targets_single(self, gts, labels, valid, feat_hw, ratio):
        """Dense targets for one image at one level. gts in input pixels,
        ratio = feat/input scale. Returns heatmaps (H,W,C), offsets (H,W,2),
        corner cell indices (G, 2x2) and masks."""
        h, w = feat_hw
        sx = gts[:, 0] * ratio
        sy = gts[:, 1] * ratio
        ex = gts[:, 2] * ratio
        ey = gts[:, 3] * ratio
        lx = jnp.clip(jnp.floor(sx), 0, w - 1)
        ty = jnp.clip(jnp.floor(sy), 0, h - 1)
        rx = jnp.clip(jnp.floor(ex), 0, w - 1)
        by = jnp.clip(jnp.floor(ey), 0, h - 1)
        # reference uses int(min(coord, size-1)) == floor for positives
        radius = jnp.maximum(
            jnp.floor(gaussian_radius(jnp.ceil(ey - sy), jnp.ceil(ex - sx),
                                      0.3)), 0.)
        sigma = (2 * radius + 1) / 6.0

        ys = jnp.arange(h, dtype=jnp.float32)
        xs = jnp.arange(w, dtype=jnp.float32)

        def heat(cx, cy):
            # (G, H, W) truncated gaussians -> max over gts per class
            d2 = ((xs[None, None, :] - cx[:, None, None])**2 +
                  (ys[None, :, None] - cy[:, None, None])**2)
            g = jnp.exp(-d2 / (2 * sigma[:, None, None]**2))
            inside = (jnp.abs(xs[None, None, :] - cx[:, None, None]) <=
                      radius[:, None, None]) & \
                     (jnp.abs(ys[None, :, None] - cy[:, None, None]) <=
                      radius[:, None, None])
            g = jnp.where(inside & valid[:, None, None], g, 0.)
            # exact 1 at the center cell
            g = jnp.maximum(g, ((xs[None, None, :] == cx[:, None, None]) &
                                (ys[None, :, None] == cy[:, None, None]) &
                                valid[:, None, None]).astype(jnp.float32))
            onehot = jax.nn.one_hot(labels, self.num_classes)  # (G, C)
            return jnp.max(g[..., None] * onehot[:, None, None, :], axis=0)

        tl_heat = heat(lx, ty)
        br_heat = heat(rx, by)

        def offsets(cx, cy, fx, fy):
            # padded gts scatter out of bounds (dropped) so they cannot
            # clobber a real corner at cell (0, 0)
            iy = jnp.where(valid, cy, h).astype(jnp.int32)
            ix = jnp.where(valid, cx, w).astype(jnp.int32)
            vals = jnp.stack([fx - cx, fy - cy], -1)  # (G, 2)
            off = jnp.zeros((h, w, 2), jnp.float32).at[iy, ix].set(
                vals, mode='drop')
            mask = jnp.zeros((h, w), bool).at[iy, ix].max(valid,
                                                          mode='drop')
            return off, mask

        tl_off, tl_mask = offsets(lx, ty, sx, sy)
        br_off, br_mask = offsets(rx, by, ex, ey)
        return (tl_heat, br_heat, tl_off, br_off, tl_mask, br_mask,
                (ty * w + lx).astype(jnp.int32),
                (by * w + rx).astype(jnp.int32))

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid,
             img_size: float = None) -> Dict:
        tl_heats, br_heats, tl_embs, br_embs, tl_offs, br_offs = preds
        out = {}
        det_l = pull_l = push_l = off_l = 0.
        for lvl in range(len(tl_heats)):
            h, w = tl_heats[lvl].shape[1:3]
            size = float(img_size) if img_size is not None else w * 4.0
            ratio = w / size

            def one(gts, labels, valid):
                return self._targets_single(gts, labels, valid, (h, w),
                                            ratio)

            (tl_hm, br_hm, tl_of, br_of, tl_m, br_m, tl_idx,
             br_idx) = jax.vmap(one)(gt_bboxes, gt_labels, gt_valid)

            tl_p = jax.nn.sigmoid(tl_heats[lvl].astype(jnp.float32))
            br_p = jax.nn.sigmoid(br_heats[lvl].astype(jnp.float32))
            n_corner = jnp.maximum(jnp.sum((tl_hm == 1).astype(jnp.float32)),
                                   1.0)
            det = (L.gaussian_focal_loss(tl_p, tl_hm, avg_factor=n_corner) +
                   L.gaussian_focal_loss(
                       br_p, br_hm,
                       avg_factor=jnp.maximum(
                           jnp.sum((br_hm == 1).astype(jnp.float32)),
                           1.0))) / 2.0

            # AE at gt corner cells
            tl_e = tl_embs[lvl].astype(jnp.float32).reshape(
                tl_hm.shape[0], -1)
            br_e = br_embs[lvl].astype(jnp.float32).reshape(
                br_hm.shape[0], -1)
            tl_g = jnp.take_along_axis(tl_e, tl_idx, axis=1)
            br_g = jnp.take_along_axis(br_e, br_idx, axis=1)
            pulls, pushes = jax.vmap(
                lambda a, b, v: L.ae_loss(a, b, v, self.pull_weight,
                                          self.push_weight))(tl_g, br_g,
                                                             gt_valid)
            # the reference SUMS the per-image AE losses over the batch
            # (ae_loss.py AssociativeEmbeddingLoss.forward)
            pull = jnp.sum(pulls)
            push = jnp.sum(pushes)

            # offset avg_factor counts corner POSITIONS (the (B,1,H,W)
            # mask sum, corner_head.py:628-646), not x/y elements
            off = (L.smooth_l1_loss(
                tl_offs[lvl].astype(jnp.float32), tl_of,
                weight=tl_m[..., None].astype(jnp.float32),
                avg_factor=jnp.maximum(jnp.sum(tl_m), 1.0)) +
                L.smooth_l1_loss(
                    br_offs[lvl].astype(jnp.float32), br_of,
                    weight=br_m[..., None].astype(jnp.float32),
                    avg_factor=jnp.maximum(jnp.sum(br_m), 1.0))) / 2.0
            det_l += det
            pull_l += pull
            push_l += push
            off_l += off * self.offset_weight
        out['loss_heatmap'] = det_l
        out['loss_pull'] = pull_l
        out['loss_push'] = push_l
        out['loss_offset'] = off_l
        out['num_gts'] = jnp.mean(jnp.sum(gt_valid.astype(jnp.float32),
                                          axis=1))
        return out

    # ------------------------------------------------------------------
    def get_bboxes(self, preds, scale_factors=None, img_size: float = None,
                   corner_topk: int = 100, num_dets: int = 1000,
                   dist_thr: float = 0.5, score_thr: float = 0.05,
                   iou_thr: float = 0.5, max_per_img: int = 100,
                   method: str = 'linear', sigma: float = 0.5,
                   min_score: float = 1e-3, **kwargs):
        tl_heats, br_heats, tl_embs, br_embs, tl_offs, br_offs = preds
        # last stack only (corner_head.py get_bboxes uses [-1])
        tl_p = jax.nn.sigmoid(tl_heats[-1].astype(jnp.float32))
        br_p = jax.nn.sigmoid(br_heats[-1].astype(jnp.float32))
        b, h, w, C = tl_p.shape
        size = float(img_size) if img_size is not None else w * 4.0
        ratio = size / w
        k = min(corner_topk, h * w)

        def local_max(p):
            m = nn.max_pool(p, (3, 3), strides=(1, 1),
                            padding=[(1, 1), (1, 1)])
            return jnp.where(p == m, p, 0.)

        def topk_corners(p, emb, off):
            flat = local_max(p).reshape(b, -1)  # (B, H*W*C)
            scores, idx = jax.lax.top_k(flat, k)
            cls = (idx % C).astype(jnp.int32)
            cell = idx // C
            ys = (cell // w).astype(jnp.float32)
            xs = (cell % w).astype(jnp.float32)
            e = jnp.take_along_axis(emb.reshape(b, -1), cell, axis=1)
            ox = jnp.take_along_axis(off[..., 0].reshape(b, -1), cell,
                                     axis=1)
            oy = jnp.take_along_axis(off[..., 1].reshape(b, -1), cell,
                                     axis=1)
            return scores, cls, (xs + ox) * ratio, (ys + oy) * ratio, e

        tl_s, tl_c, tl_x, tl_y, tl_e = topk_corners(
            tl_p, tl_embs[-1].astype(jnp.float32),
            tl_offs[-1].astype(jnp.float32))
        br_s, br_c, br_x, br_y, br_e = topk_corners(
            br_p, br_embs[-1].astype(jnp.float32),
            br_offs[-1].astype(jnp.float32))

        # all pairs (B, k, k)
        score = (tl_s[:, :, None] + br_s[:, None, :]) / 2.0
        same_cls = tl_c[:, :, None] == br_c[:, None, :]
        dist = jnp.abs(tl_e[:, :, None] - br_e[:, None, :])
        geom = (br_x[:, None, :] > tl_x[:, :, None]) & \
               (br_y[:, None, :] > tl_y[:, :, None])
        valid = same_cls & (dist < dist_thr) & geom
        score = jnp.where(valid, score, -1.)

        nd = min(num_dets, k * k)
        flat = score.reshape(b, -1)
        top_scores, idx = jax.lax.top_k(flat, nd)
        ti = idx // k
        bi = idx % k
        boxes = jnp.stack([
            jnp.take_along_axis(tl_x, ti, 1),
            jnp.take_along_axis(tl_y, ti, 1),
            jnp.take_along_axis(br_x, bi, 1),
            jnp.take_along_axis(br_y, bi, 1)
        ], -1)
        labels = jnp.take_along_axis(tl_c, ti, 1)
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, :]

        # class-offset trick + soft-NMS then top max_per_img
        # (reference _bboxes_nms with cfg nms=soft_nms); the offset step
        # must exceed the LARGEST post-rescale coordinate, not the
        # static input size, or class bands overlap on upscaled outputs
        pair_valid_all = top_scores > 0
        max_coord = jnp.max(jnp.where(pair_valid_all[..., None], boxes,
                                      0.)) + 1.0
        cls_off = labels.astype(jnp.float32)[..., None] * max_coord

        def one(bx, sc, lb, of, vm):
            # the reference cornernet config asks soft_nms with
            # method='gaussian' (configs/cornernet/*.py:28)
            keep_idx, keep_scores, keep_valid = soft_nms_padded(
                bx + of, sc, iou_thr, max_per_img, valid=vm,
                method=method, sigma=sigma, min_score=min_score)
            kb = bx[keep_idx]
            kl = lb[keep_idx]
            ok = keep_valid & (keep_scores > score_thr)
            return (jnp.where(ok[:, None], kb, 0.),
                    jnp.where(ok, keep_scores, 0.), kl, ok)

        pair_valid = top_scores > 0
        sb, ss, sl, sv = jax.vmap(one)(boxes, top_scores, labels, cls_off,
                                       pair_valid)
        return NMSResult(sb, ss, sl, sv)
