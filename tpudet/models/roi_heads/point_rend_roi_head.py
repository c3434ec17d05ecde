"""PointRend (reference mmdet/models/roi_heads/point_rend_roi_head.py,
mask_heads/mask_point_head.py, mask_heads/coarse_mask_head.py,
detectors/point_rend.py; config configs/point_rend/point_rend_r50_*).

- ``CoarseMaskHead``: P2-only 14x14 RoI features -> stride-2 downsample
  conv -> 2 FCs -> per-class 7x7 coarse mask logits
  (coarse_mask_head.py:30-99);
- ``MaskPointHead``: an MLP over per-point [fine-grained P2 feature ||
  coarse logits] with the coarse prediction re-concatenated after every
  layer (mask_point_head.py:86-105);
- training samples 196 points per positive RoI: 3x oversampled uniform
  points ranked by sampled-logit uncertainty ``-|logit[gt_class]|``,
  75% most-uncertain + 25% random (mask_point_head.py:213-266);
- testing runs ``subdivision_steps`` rounds of 2x bilinear upsampling,
  re-evaluating the ``subdivision_num_points`` most uncertain pixels
  with the point head and scattering the refined logits back
  (point_rend_roi_head.py:88-134).

Shape-static adaptations: positives are gathered into a fixed slot
table; the training point randomness is hashed from RoI coordinates (the
loss path is pure); gt supervision point-samples the static gt-frame
mask representation (tpudet/core/mask.py) instead of image-resolution
bitmap masks.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.roi_align import roi_align
from ...registry import DETECTORS, HEADS
from .. import losses as L
from .mask_head import MaskRCNN, MaskRoIHead


def point_sample_map(feat, xy):
    """Bilinear sample a (H, W, C) map at normalized [0,1]^2 coords
    (P, 2) -> (P, C); grid_sample align_corners=False convention."""
    h, w = feat.shape[:2]
    x = xy[:, 0] * w - 0.5
    y = xy[:, 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def tap(yy, xx):
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        v = feat[yi, xi]
        inb = ((yy >= 0) & (yy <= h - 1) & (xx >= 0) &
               (xx <= w - 1))[:, None]
        return v * inb

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01) +
            fy * ((1 - fx) * v10 + fx * v11))


def _hash_uniform(key_vals, n, salt):
    """(R,) float keys -> (R, n) pseudo-uniforms in [0, 1)."""
    i = jnp.arange(1, n + 1, dtype=jnp.float32)[None, :]
    s = jnp.sin(key_vals[:, None] * 12.9898 + i * salt) * 43758.5453
    return s - jnp.floor(s)


@HEADS.register_module()
class CoarseMaskHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    num_fcs: int = 2
    roi_feat_size: int = 14
    downsample_factor: int = 2
    dtype: Any = None

    @property
    def output_size(self) -> int:
        return self.roi_feat_size // self.downsample_factor

    @nn.compact
    def __call__(self, roi_feats, train: bool = False):
        """(N, 14, 14, C) -> (N, 7, 7, num_classes) coarse logits."""
        d = self.downsample_factor
        x = roi_feats
        if d > 1:
            x = jax.nn.relu(
                nn.Conv(self.conv_out_channels, (d, d), (d, d),
                        padding='VALID', dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name='downsample_conv')(x))
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = jax.nn.relu(
                nn.Dense(self.fc_out_channels, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name=f'fc{i}')(x))
        out = self.output_size
        x = nn.Dense(self.num_classes * out * out, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(0.001),
                     name='fc_logits')(x)
        return x.reshape(x.shape[0], out, out, self.num_classes)


@HEADS.register_module()
class MaskPointHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    fc_channels: int = 256
    num_fcs: int = 3
    coarse_pred_each_layer: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, fine_feats, coarse_feats, train: bool = False):
        """fine (N, P, Cf) + coarse (N, P, C) -> (N, P, C) point logits."""
        x = jnp.concatenate([fine_feats, coarse_feats], axis=-1)
        for i in range(self.num_fcs):
            x = jax.nn.relu(
                nn.Dense(self.fc_channels, dtype=self.dtype,
                         kernel_init=nn.initializers.he_normal(),
                         name=f'fc{i}')(x))
            if self.coarse_pred_each_layer:
                x = jnp.concatenate([x, coarse_feats], axis=-1)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.001),
                        name='fc_logits')(x)


@HEADS.register_module()
class PointRendRoIHead(MaskRoIHead):
    """Mask branch = coarse head on P2-only 14x14 features + point head.

    ``train_cfg`` knobs of the reference map to fields:
    num_points=196, oversample_ratio=3, importance_sample_ratio=0.75,
    subdivision_steps, subdivision_num_points, scale_factor.
    """
    num_points: int = 196
    oversample_ratio: int = 3
    importance_sample_ratio: float = 0.75
    subdivision_steps: int = 5
    subdivision_num_points: int = 784
    scale_factor: int = 2
    max_num_point_rois: int = 96
    point_roi_size: int = 14
    mask_size: int = 7  # coarse loss target resolution (14 // downsample)

    def setup(self):
        super(MaskRoIHead, self).setup()
        self.mask_head = CoarseMaskHead(num_classes=self.num_classes,
                                        in_channels=self.in_channels,
                                        roi_feat_size=self.point_roi_size,
                                        dtype=self.dtype)
        self.point_head = MaskPointHead(num_classes=self.num_classes,
                                        in_channels=self.in_channels,
                                        dtype=self.dtype)

    # -- coarse branch ---------------------------------------------------
    def mask_forward(self, feats, rois, roi_valid, train: bool = False):
        """P2-only SimpleRoIAlign at 14 -> coarse head (the reference's
        GenericRoIExtractor with featmap_strides=[4])."""
        def one(p2, r, v):
            return roi_align(p2, r, out_size=self.point_roi_size,
                             spatial_scale=1.0 / self.featmap_strides[0])
        pooled = jax.vmap(one)(feats[0], rois, roi_valid)
        b, p = pooled.shape[:2]
        x = pooled.reshape((b * p,) + pooled.shape[2:])
        logits = self.mask_head(x, train)
        return logits.reshape((b, p) + logits.shape[1:])

    # -- point branch ----------------------------------------------------
    def _roi_points_to_img(self, rois, pts):
        """roi-relative [0,1]^2 points (R, P, 2) -> absolute img coords."""
        x1, y1 = rois[:, None, 0], rois[:, None, 1]
        w = rois[:, None, 2] - x1
        h = rois[:, None, 3] - y1
        return jnp.stack([x1 + pts[..., 0] * w, y1 + pts[..., 1] * h], -1)

    def _sample_fine(self, p2, rois, pts):
        """Sample P2 features at roi-relative points: (R, P, C)."""
        img_pts = self._roi_points_to_img(rois, pts)
        hw = jnp.asarray([p2.shape[1] * self.featmap_strides[0],
                          p2.shape[0] * self.featmap_strides[0]],
                         jnp.float32)
        norm = img_pts / hw
        return jax.vmap(lambda xy: point_sample_map(p2, xy))(norm)

    def _sample_coarse(self, coarse, pts):
        """Sample per-roi coarse logit maps (R, 7, 7, C) at (R, P, 2)."""
        return jax.vmap(point_sample_map)(coarse, pts)

    def point_train(self, feats, rois, pos, labels, targets,
                    coarse_logits):
        """Select train points + run the point head on capped positives.

        Returns (point_logits, points, rois_k, labels_k, pos_k)."""
        b, s = pos.shape
        k = min(self.max_num_point_rois, s)
        order = jnp.argsort(~pos, axis=1, stable=True)[:, :k]
        sel = lambda t: jnp.take_along_axis(  # noqa: E731
            t, order.reshape(order.shape + (1,) * (t.ndim - 2)), axis=1)
        pos_k = jnp.take_along_axis(pos, order, axis=1)
        rois_k = sel(rois)
        labels_k = jnp.take_along_axis(labels, order, axis=1)
        coarse_k = sel(coarse_logits)
        gt_k = self.bbox_coder.decode(rois_k, sel(targets))

        n_over = self.num_points * self.oversample_ratio
        n_imp = int(self.importance_sample_ratio * self.num_points)
        n_rand = self.num_points - n_imp

        def one(rois_i, labels_i, coarse_i, img_id):
            key = jnp.sum(rois_i * jnp.asarray([1.7, 2.3, 3.1, 4.7]), -1) \
                + img_id * 17.0
            ux = _hash_uniform(key, n_over, 78.233)
            uy = _hash_uniform(key, n_over, 37.719)
            cand = jnp.stack([ux, uy], -1)  # (K, n_over, 2)
            logit = self._sample_coarse(coarse_i, cand)  # (K, n_over, C)
            cls = jnp.clip(labels_i, 0, self.num_classes - 1)
            lc = jnp.take_along_axis(logit, cls[:, None, None], -1)[..., 0]
            unc = -jnp.abs(lc)
            _, top = jax.lax.top_k(unc, n_imp)
            imp_pts = jnp.take_along_axis(cand, top[..., None], axis=1)
            rand_pts = jnp.stack([
                _hash_uniform(key + 3.33, n_rand, 78.233),
                _hash_uniform(key + 3.33, n_rand, 37.719)], -1)
            return jnp.concatenate([imp_pts, rand_pts], axis=1)

        pts = jax.vmap(one)(rois_k, labels_k, coarse_k,
                            jnp.arange(b, dtype=jnp.float32))
        pts = jax.lax.stop_gradient(pts)

        fine = jax.vmap(self._sample_fine)(feats[0], rois_k, pts)
        coarse_pt = jax.vmap(self._sample_coarse)(coarse_k, pts)
        flat = lambda t: t.reshape((-1,) + t.shape[2:])  # noqa: E731
        logits = self.point_head(flat(fine), flat(coarse_pt), True)
        logits = logits.reshape((b, k) + logits.shape[1:])
        return logits, pts, rois_k, gt_k, labels_k, pos_k

    def point_loss(self, point_logits, pts, rois_k, gt_k, labels_k, pos_k,
                   gt_idx_k, gt_frame_masks) -> Dict:
        """BCE on the gt-class point logits vs point-sampled gt masks."""
        b, k, p = point_logits.shape[:3]
        s = gt_frame_masks.shape[-1]

        def one(logits_i, pts_i, rois_i, gt_i, labels_i, gtm_i, gidx_i):
            img_pts = self._roi_points_to_img(rois_i, pts_i)  # (K, P, 2)
            # gt-frame normalized coords of each point
            gx1, gy1 = gt_i[:, None, 0], gt_i[:, None, 1]
            gw = jnp.maximum(gt_i[:, None, 2] - gx1, 1e-3)
            gh = jnp.maximum(gt_i[:, None, 3] - gy1, 1e-3)
            norm = jnp.stack([(img_pts[..., 0] - gx1) / gw,
                              (img_pts[..., 1] - gy1) / gh], -1)
            masks = gtm_i[gidx_i][..., None]  # (K, S, S, 1)
            tgt = jax.vmap(point_sample_map)(masks, norm)[..., 0]
            cls = jnp.clip(labels_i, 0, self.num_classes - 1)
            lg = jnp.take_along_axis(logits_i, cls[:, None, None],
                                     -1)[..., 0]
            bce = L.binary_cross_entropy_with_logits(
                lg, jnp.clip(tgt, 0., 1.))
            return bce

        gt_idx_k = jnp.clip(gt_idx_k, 0, None)
        bce = jax.vmap(one)(point_logits.astype(jnp.float32), pts, rois_k,
                            gt_k, labels_k, gt_frame_masks, gt_idx_k)
        w = pos_k[..., None].astype(jnp.float32)
        n = jnp.maximum(jnp.sum(w), 1.0) * p
        return dict(loss_point=jnp.sum(bce * w) / n)

    # -- subdivision inference -------------------------------------------
    def refine_masks(self, feats, det_bboxes, det_valid, det_labels,
                     coarse_logits):
        """Iterative point-based upsampling of the predicted-class mask.

        coarse_logits (B, D, 7, 7, C) -> refined (B, D, R, R) sigmoid
        probabilities, R = 7 * scale_factor**subdivision_steps.
        """
        cls = jnp.clip(det_labels, 0, self.num_classes - 1)
        m = jnp.take_along_axis(
            coarse_logits.astype(jnp.float32),
            cls[:, :, None, None, None], -1)[..., 0]  # (B, D, 7, 7)

        def one_det(p2, rois_i, m_i, coarse_i, cls_i):
            cur = m_i
            for _ in range(self.subdivision_steps):
                hh = cur.shape[-1] * self.scale_factor
                cur = jax.image.resize(cur, cur.shape[:1] + (hh, hh),
                                       'bilinear')
                npts = min(self.subdivision_num_points, hh * hh)
                unc = -jnp.abs(cur).reshape(cur.shape[0], -1)
                _, idx = jax.lax.top_k(unc, npts)
                py = (idx // hh).astype(jnp.float32)
                px = (idx % hh).astype(jnp.float32)
                pts = jnp.stack([(px + 0.5) / hh, (py + 0.5) / hh], -1)
                fine = self._sample_fine(p2, rois_i, pts)
                coarse_pt = self._sample_coarse(coarse_i, pts)
                logits = self.point_head(fine, coarse_pt, False)
                lg = jnp.take_along_axis(
                    logits, cls_i[:, None, None].repeat(npts, 1),
                    -1)[..., 0]
                flatc = cur.reshape(cur.shape[0], -1)
                flatc = jax.vmap(lambda f, i, v: f.at[i].set(v))(
                    flatc, idx, lg)
                cur = flatc.reshape(cur.shape[0], hh, hh)
            return cur

        refined = jax.vmap(one_det)(feats[0], det_bboxes, m, coarse_logits,
                                    cls)
        return jax.nn.sigmoid(refined) * det_valid[..., None, None]


@DETECTORS.register_module()
class PointRend(MaskRCNN):
    """PointRend detector (reference detectors/point_rend.py): Mask R-CNN
    whose mask branch is the coarse+point pipeline."""

    def forward_train(self, img, gt_bboxes, gt_labels, gt_valid,
                      gt_frame_masks):
        feats = self.extract_feat(img, train=True)
        rpn_preds = self.rpn_head(feats, train=True)
        losses = self.rpn_head.loss(rpn_preds, gt_bboxes, gt_labels,
                                    gt_valid)
        cfg = dict(self.train_cfg or {}).get('rpn_proposal', {})
        proposals, _, prop_valid = self.rpn_head.get_proposals(
            rpn_preds, img_shape=img.shape[1:3],
            nms_pre=cfg.get('nms_pre', 2000),
            max_num=cfg.get('max_per_img', 1000),
            iou_thr=cfg.get('nms', {}).get('iou_threshold', 0.7))
        proposals = jax.lax.stop_gradient(proposals)

        rois, sampled, labels, targets, pos = self.roi_head.sample_rois(
            proposals, prop_valid, gt_bboxes, gt_labels, gt_valid)
        cls_logits, deltas = self.roi_head(feats, rois, sampled, True)
        losses.update(self.roi_head.loss(cls_logits, deltas, labels,
                                         targets, pos, sampled, rois=rois))

        from ...core.assigners import max_iou_assign
        gt_idx = jax.vmap(
            lambda r, g, gv: max_iou_assign(r, g, gv, 0.5, 0.5, 0.5, True)
        )(rois, gt_bboxes, gt_valid)
        coarse = self.roi_head.mask_forward(feats, rois, sampled, True)
        losses.update(self.roi_head.mask_loss(
            coarse, rois, pos, gt_idx, gt_bboxes, gt_frame_masks, labels))

        point_logits, pts, rois_k, gt_k, labels_k, pos_k = \
            self.roi_head.point_train(feats, rois, pos, labels, targets,
                                      coarse)
        k = rois_k.shape[1]
        order = jnp.argsort(~pos, axis=1, stable=True)[:, :k]
        gt_idx_k = jnp.take_along_axis(jnp.clip(gt_idx, 0, None), order,
                                       axis=1)
        losses.update(self.roi_head.point_loss(
            point_logits, pts, rois_k, gt_k, labels_k, pos_k, gt_idx_k,
            gt_frame_masks))
        losses['num_gts'] = jnp.mean(
            jnp.sum(gt_valid.astype(jnp.float32), axis=1))
        return losses

    def predict_masks(self, img, det_bboxes, det_valid, det_labels):
        """Subdivision-refined masks: (B, D, R, R) probabilities."""
        feats = self.extract_feat(img, train=False)
        coarse = self.roi_head.mask_forward(feats, det_bboxes, det_valid,
                                            False)
        return self.roi_head.refine_masks(feats, det_bboxes, det_valid,
                                          det_labels, coarse)
