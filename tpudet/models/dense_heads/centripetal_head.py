"""CentripetalNet head (reference mmdet/models/dense_heads/
centripetal_head.py; config configs/centripetal/).

CornerHead with the associative-embedding branch replaced by geometry:
- a guiding shift per corner (corner -> box center, smooth-L1 w=0.05 at
  gt corner cells) whose stop-gradient feeds a 1x1 conv predicting
  deform offsets for per-corner feature adaption
  (centripetal_head.py:73-133);
- a centripetal shift (log-encoded corner->center distance, smooth-L1
  w=1) predicted from the adapted features;
- decode pairs corners whose shifted center estimates both fall inside
  the candidate box's central region (mu = 1/2.4, or 1/2.1 for areas
  > 3500) and whose center-box/central-region area ratio is below the
  distance threshold (corner_head.py:958-1040), instead of embedding
  distance.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.nms import NMSResult, soft_nms_padded
from ...ops.deform_conv import DeformConv2d
from ...registry import DETECTORS, HEADS
from .. import losses as L
from ..detectors.single_stage import SingleStageDetector
from .corner_head import BiCornerPool, CornerHead, _PredBranch


@HEADS.register_module()
class CentripetalHead(CornerHead):
    guiding_weight: float = 0.05
    centripetal_weight: float = 1.0

    @nn.compact
    def __call__(self, feats, train: bool = False):
        import math
        hm_bias = float(-math.log((1 - 0.1) / 0.1))
        keys = ('tl_heat', 'br_heat', 'tl_off', 'br_off', 'tl_guide',
                'br_guide', 'tl_centri', 'br_centri')
        outs = {k: [] for k in keys}
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
            outs['tl_off'].append(
                _PredBranch(2, dtype=self.dtype, name=f'tl_off{i}')(tl))
            outs['br_off'].append(
                _PredBranch(2, dtype=self.dtype, name=f'br_off{i}')(br))

            tl_guide = _PredBranch(2, dtype=self.dtype,
                                   name=f'tl_guide{i}')(tl)
            br_guide = _PredBranch(2, dtype=self.dtype,
                                   name=f'br_guide{i}')(br)
            outs['tl_guide'].append(tl_guide)
            outs['br_guide'].append(br_guide)

            def adapt(pool, guide, name):
                off = nn.Conv(2 * 9, (1, 1), use_bias=False,
                              dtype=self.dtype,
                              kernel_init=nn.initializers.normal(0.1),
                              name=f'{name}_dcn_off')(
                                  jax.lax.stop_gradient(guide))
                a = DeformConv2d(self.in_channels, kernel_size=3,
                                 dtype=self.dtype,
                                 name=f'{name}_adapt')(pool, off)
                return jax.nn.relu(a)

            tl_a = adapt(tl, tl_guide, f'tl{i}')
            br_a = adapt(br, br_guide, f'br{i}')
            outs['tl_centri'].append(
                _PredBranch(2, dtype=self.dtype, name=f'tl_centri{i}')(tl_a))
            outs['br_centri'].append(
                _PredBranch(2, dtype=self.dtype, name=f'br_centri{i}')(br_a))
        return tuple(tuple(outs[k]) for k in keys)

    # ------------------------------------------------------------------
    def _shift_targets_single(self, gts, valid, feat_hw, ratio):
        """Guiding/centripetal shift targets at the gt corner cells.

        Returns tl/br guiding (H,W,2), tl/br centripetal (H,W,2), masks."""
        h, w = feat_hw
        sx = gts[:, 0] * ratio
        sy = gts[:, 1] * ratio
        ex = gts[:, 2] * ratio
        ey = gts[:, 3] * ratio
        cx = (sx + ex) / 2
        cy = (sy + ey) / 2
        lx = jnp.clip(jnp.floor(sx), 0, w - 1)
        ty = jnp.clip(jnp.floor(sy), 0, h - 1)
        rx = jnp.clip(jnp.floor(ex), 0, w - 1)
        by = jnp.clip(jnp.floor(ey), 0, h - 1)

        def put(ix, iy, vals):
            # padded gts scatter OUT OF BOUNDS (dropped) instead of
            # writing zeros at cell (0, 0), which would clobber a real
            # gt whose corner clamps to the image edge
            iyc = jnp.where(valid, iy, h).astype(jnp.int32)
            ixc = jnp.where(valid, ix, w).astype(jnp.int32)
            m = jnp.zeros((h, w, 2), jnp.float32).at[iyc, ixc].set(
                vals, mode='drop')
            mask = jnp.zeros((h, w), bool).at[iyc, ixc].max(
                valid, mode='drop')
            return m, mask

        eps = 1e-4
        tl_g, tl_m = put(lx, ty, jnp.stack([cx - lx, cy - ty], -1))
        br_g, br_m = put(rx, by, jnp.stack([rx - cx, by - cy], -1))
        tl_c, _ = put(lx, ty, jnp.log(jnp.maximum(
            jnp.stack([cx - sx, cy - sy], -1), eps)))
        br_c, _ = put(rx, by, jnp.log(jnp.maximum(
            jnp.stack([ex - cx, ey - cy], -1), eps)))
        return tl_g, br_g, tl_c, br_c, tl_m, br_m

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid,
             img_size: float = None) -> Dict:
        (tl_heats, br_heats, tl_offs, br_offs, tl_guides, br_guides,
         tl_centris, br_centris) = preds
        det_l = off_l = guide_l = centri_l = 0.
        for lvl in range(len(tl_heats)):
            h, w = tl_heats[lvl].shape[1:3]
            size = float(img_size) if img_size is not None else w * 4.0
            ratio = w / size

            def one(gts, labels, valid):
                return self._targets_single(gts, labels, valid, (h, w),
                                            ratio)

            (tl_hm, br_hm, tl_of, br_of, tl_m, br_m, _,
             _) = jax.vmap(one)(gt_bboxes, gt_labels, gt_valid)

            def one_shift(gts, valid):
                return self._shift_targets_single(gts, valid, (h, w),
                                                  ratio)

            (tl_g, br_g, tl_c, br_c, tl_sm, br_sm) = jax.vmap(one_shift)(
                gt_bboxes, gt_valid)

            tl_p = jax.nn.sigmoid(tl_heats[lvl].astype(jnp.float32))
            br_p = jax.nn.sigmoid(br_heats[lvl].astype(jnp.float32))
            det_l += (L.gaussian_focal_loss(
                tl_p, tl_hm, avg_factor=jnp.maximum(
                    jnp.sum((tl_hm == 1).astype(jnp.float32)), 1.0)) +
                L.gaussian_focal_loss(
                    br_p, br_hm, avg_factor=jnp.maximum(
                        jnp.sum((br_hm == 1).astype(jnp.float32)),
                        1.0))) / 2.0
            # offset avg_factor counts corner POSITIONS (the (B,1,H,W)
            # mask sum, corner_head.py:628-646), not x/y elements
            off_l += (L.smooth_l1_loss(
                tl_offs[lvl].astype(jnp.float32), tl_of,
                weight=tl_m[..., None].astype(jnp.float32),
                avg_factor=jnp.maximum(jnp.sum(tl_m), 1.0)) +
                L.smooth_l1_loss(
                    br_offs[lvl].astype(jnp.float32), br_of,
                    weight=br_m[..., None].astype(jnp.float32),
                    avg_factor=jnp.maximum(jnp.sum(br_m), 1.0))) / 2.0

            def shift_loss(pred, tgt, mask, weight):
                return L.smooth_l1_loss(
                    pred.astype(jnp.float32), tgt,
                    weight=mask[..., None].astype(jnp.float32),
                    avg_factor=jnp.maximum(jnp.sum(mask), 1.0),
                    loss_weight=weight)

            guide_l += (shift_loss(tl_guides[lvl], tl_g, tl_sm,
                                   self.guiding_weight) +
                        shift_loss(br_guides[lvl], br_g, br_sm,
                                   self.guiding_weight)) / 2.0
            centri_l += (shift_loss(tl_centris[lvl], tl_c, tl_sm,
                                    self.centripetal_weight) +
                         shift_loss(br_centris[lvl], br_c, br_sm,
                                    self.centripetal_weight)) / 2.0
        return dict(loss_heatmap=det_l, loss_offset=off_l,
                    loss_guiding=guide_l, loss_centripetal=centri_l,
                    num_gts=jnp.mean(jnp.sum(gt_valid.astype(jnp.float32),
                                             axis=1)))

    # ------------------------------------------------------------------
    def get_bboxes(self, preds, scale_factors=None, img_size: float = None,
                   corner_topk: int = 100, num_dets: int = 1000,
                   dist_thr: float = 0.5, score_thr: float = 0.05,
                   iou_thr: float = 0.5, max_per_img: int = 100,
                   method: str = 'linear', sigma: float = 0.5,
                   min_score: float = 1e-3, **kwargs):
        (tl_heats, br_heats, tl_offs, br_offs, _, _, tl_centris,
         br_centris) = preds
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

        def topk_corners(p, off, shift):
            flat = local_max(p).reshape(b, -1)
            scores, idx = jax.lax.top_k(flat, k)
            cls = (idx % C).astype(jnp.int32)
            cell = idx // C
            ys = (cell // w).astype(jnp.float32)
            xs = (cell % w).astype(jnp.float32)
            ox = jnp.take_along_axis(off[..., 0].reshape(b, -1), cell, 1)
            oy = jnp.take_along_axis(off[..., 1].reshape(b, -1), cell, 1)
            shx = jnp.exp(jnp.clip(jnp.take_along_axis(
                shift[..., 0].reshape(b, -1), cell, 1), -10., 10.))
            shy = jnp.exp(jnp.clip(jnp.take_along_axis(
                shift[..., 1].reshape(b, -1), cell, 1), -10., 10.))
            return (scores, cls, (xs + ox) * ratio, (ys + oy) * ratio,
                    shx * ratio, shy * ratio)

        tl_s, tl_c, tl_x, tl_y, tl_shx, tl_shy = topk_corners(
            tl_p, tl_offs[-1].astype(jnp.float32),
            tl_centris[-1].astype(jnp.float32))
        br_s, br_c, br_x, br_y, br_shx, br_shy = topk_corners(
            br_p, br_offs[-1].astype(jnp.float32),
            br_centris[-1].astype(jnp.float32))

        score = (tl_s[:, :, None] + br_s[:, None, :]) / 2.0
        same_cls = tl_c[:, :, None] == br_c[:, None, :]
        geom = (br_x[:, None, :] > tl_x[:, :, None]) & \
               (br_y[:, None, :] > tl_y[:, :, None])

        # centripetal matching (corner_head.py:958-1040)
        x1 = jnp.broadcast_to(tl_x[:, :, None], score.shape)
        y1 = jnp.broadcast_to(tl_y[:, :, None], score.shape)
        x2 = jnp.broadcast_to(br_x[:, None, :], score.shape)
        y2 = jnp.broadcast_to(br_y[:, None, :], score.shape)
        ctx1 = x1 + jnp.broadcast_to(tl_shx[:, :, None], score.shape)
        cty1 = y1 + jnp.broadcast_to(tl_shy[:, :, None], score.shape)
        ctx2 = x2 - jnp.broadcast_to(br_shx[:, None, :], score.shape)
        cty2 = y2 - jnp.broadcast_to(br_shy[:, None, :], score.shape)
        area = jnp.abs((x2 - x1) * (y2 - y1))
        mu = jnp.where(area > 3500., 1 / 2.1, 1 / 2.4)
        bcx = (x1 + x2) / 2
        bcy = (y1 + y2) / 2
        rx1 = bcx - mu * (x2 - x1) / 2
        ry1 = bcy - mu * (y2 - y1) / 2
        rx2 = bcx + mu * (x2 - x1) / 2
        ry2 = bcy + mu * (y2 - y1) / 2
        area_ct = jnp.abs((ctx2 - ctx1) * (cty2 - cty1))
        area_r = jnp.maximum(jnp.abs((rx2 - rx1) * (ry2 - ry1)), 1e-6)
        inside = (ctx1 > rx1) & (ctx1 < rx2) & (cty1 > ry1) & \
            (cty1 < ry2) & (ctx2 > rx1) & (ctx2 < rx2) & \
            (cty2 > ry1) & (cty2 < ry2)
        dists = area_ct / area_r
        valid = same_cls & geom & inside & (dists <= dist_thr)
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
        cls_off = labels.astype(jnp.float32)[..., None] * (size + 1.0)

        def one(bx, sc, lb, of, vm):
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


@DETECTORS.register_module()
class CentripetalNet(SingleStageDetector):
    """configs/centripetalnet (reference detectors/cornernet.py reused
    with the centripetal head)."""

    def get_bboxes(self, pred_maps, **kwargs):
        cfg = dict(self.test_cfg or {})
        cfg.pop('nms', None)
        cfg.update(kwargs)
        return self.bbox_head.get_bboxes(pred_maps, **cfg)
