"""Grid R-CNN (reference mmdet/models/roi_heads/grid_roi_head.py,
mask_heads/grid_head.py, detectors/grid_rcnn.py; config
configs/grid_rcnn/grid_rcnn_r50_fpn_gn-head_2x_coco.py).

Localization by grid-point heatmaps instead of delta regression:
- the bbox branch is classification-only (``with_reg=False``);
- a grid head predicts 9 point heatmaps per positive RoI at 14x14 pooled
  resolution through 8 GN convs, spatial-information-fusion transitions
  (per-edge depthwise 5x5 + 1x1, first and second order), and two grouped
  2x deconvs -> (28, 28, 9) over Grid-R-CNN-Plus sub-regions of the
  2x-expanded RoI (grid_head.py:154-189);
- targets mark radius-``pos_radius`` circles at the gt grid-point
  positions, computed here analytically on the sub-region coordinate
  grid instead of rasterizing 56x56 canvases (grid_head.py:222-287);
- test-time boxes come from per-boundary score-weighted voting of the
  heatmap argmaxes (grid_head.py:297-362).

Shape-static adaptations: positive RoIs are gathered into a fixed
``max_num_grid`` slot table; the training jitter derives pseudo-random
offsets from the RoI coordinates (a hash) because the loss path is pure.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.roi_align import multilevel_roi_align
from ...registry import DETECTORS, HEADS
from ..detectors.two_stage import TwoStageDetector
from .standard_roi_head import StandardRoIHead


def _grouped_deconv2x(x, kernel, groups):
    """Grouped 2x transposed conv (k=4, s=2, p=1) as an interior-padded
    dilated conv; kernel (4, 4, Cin//groups, Cout)."""
    return jax.lax.conv_general_dilated(
        x.astype(kernel.dtype), kernel, (1, 1), [(2, 2), (2, 2)],
        lhs_dilation=(2, 2), feature_group_count=groups,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


@HEADS.register_module()
class GridHead(nn.Module):
    grid_points: int = 9
    num_convs: int = 8
    roi_feat_size: int = 14
    point_feat_channels: int = 64
    gn_groups: int = 36
    dtype: Any = None

    @property
    def grid_size(self) -> int:
        return int(np.sqrt(self.grid_points))

    @property
    def whole_map_size(self) -> int:
        return self.roi_feat_size * 4

    @property
    def half_size(self) -> int:
        return self.whole_map_size // 4 * 2

    def sub_regions(self):
        """Per-point (x1, y1) sub-region offsets (grid_head.py:191-220)."""
        gs, whole, half = self.grid_size, self.whole_map_size, self.half_size
        out = []
        for i in range(self.grid_points):
            x_idx, y_idx = i // gs, i % gs
            def off(idx):
                if idx == 0:
                    return 0
                if idx == gs - 1:
                    return half
                return max(int((idx / (gs - 1) - 0.25) * whole), 0)
            out.append((off(x_idx), off(y_idx)))
        return out

    def neighbor_points(self):
        gs = self.grid_size
        out = []
        for i in range(gs):
            for j in range(gs):
                nb = []
                if i > 0:
                    nb.append((i - 1) * gs + j)
                if j > 0:
                    nb.append(i * gs + j - 1)
                if j < gs - 1:
                    nb.append(i * gs + j + 1)
                if i < gs - 1:
                    nb.append((i + 1) * gs + j)
                out.append(tuple(nb))
        return out

    @nn.compact
    def __call__(self, x, train: bool = False):
        """(N, 14, 14, C) -> (fused, unfused) heatmaps (N, 28, 28, P)."""
        g, c = self.grid_points, self.point_feat_channels
        co = g * c
        for i in range(self.num_convs):
            stride = 2 if i == 0 else 1
            x = nn.Conv(co, (3, 3), (stride, stride), padding='SAME',
                        use_bias=True, dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=f'conv{i}')(x)
            x = nn.GroupNorm(num_groups=self.gn_groups, dtype=self.dtype,
                             name=f'gn{i}')(x)
            x = jax.nn.relu(x)

        def trans(name):
            dw = nn.Conv(c, (5, 5), padding='SAME', feature_group_count=c,
                         use_bias=True, dtype=self.dtype,
                         kernel_init=nn.initializers.he_normal(),
                         name=f'{name}_dw')
            pw = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype,
                         kernel_init=nn.initializers.he_normal(),
                         name=f'{name}_pw')
            return lambda t: pw(dw(t))

        neighbors = self.neighbor_points()
        pt = [x[..., i * c:(i + 1) * c] for i in range(g)]
        # first-order fusion
        x_fo = []
        for i, nbs in enumerate(neighbors):
            acc = pt[i]
            for j, p in enumerate(nbs):
                acc = acc + trans(f'fo{i}_{j}')(pt[p])
            x_fo.append(acc)
        # second-order fusion
        x_so = []
        for i, nbs in enumerate(neighbors):
            acc = pt[i]
            for j, p in enumerate(nbs):
                acc = acc + trans(f'so{i}_{j}')(x_fo[p])
            x_so.append(acc)

        dk1 = self.param('deconv1_kernel', nn.initializers.normal(0.001),
                         (4, 4, c, co))
        db1 = self.param('deconv1_bias', nn.initializers.zeros, (co,))
        dk2 = self.param('deconv2_kernel', nn.initializers.normal(0.001),
                         (4, 4, c, g))
        # prior bias so initial heatmap sigmoid ~ 0.01 (grid_head init_cfg)
        db2 = self.param('deconv2_bias',
                         nn.initializers.constant(-float(np.log(99.))), (g,))
        gn_f = nn.GroupNorm(num_groups=g, dtype=self.dtype, name='dgn')

        def head(feat):
            h = _grouped_deconv2x(feat, dk1, g) + db1
            h = jax.nn.relu(gn_f(h))
            return _grouped_deconv2x(h, dk2, g) + db2

        fused = head(jnp.concatenate(x_so, axis=-1))
        unfused = head(x) if train else fused
        return fused, unfused

    # ------------------------------------------------------------------
    def _factors(self):
        gs = self.grid_size
        return np.array([[1 - (j // gs) / (gs - 1), 1 - (j % gs) / (gs - 1)]
                         for j in range(self.grid_points)], np.float32)

    def get_targets(self, pos_rois, gt_boxes, pos_radius: float = 1.0):
        """Analytic circle targets on the sub-region grids.

        pos_rois/gt_boxes (N, 4) -> targets (N, half, half, P) in {0,1}.
        Small (2x-expanded side <= grid_size) rois get all-zero maps,
        matching the reference's `continue` (grid_head.py:259-262).
        """
        whole, half, g = self.whole_map_size, self.half_size, self.grid_points
        w = pos_rois[:, 2] - pos_rois[:, 0]
        h = pos_rois[:, 3] - pos_rois[:, 1]
        x1e = pos_rois[:, 0] - w / 2
        y1e = pos_rois[:, 1] - h / 2
        we, he = 2 * w, 2 * h

        fac = jnp.asarray(self._factors())  # (P, 2)
        gx = fac[None, :, 0] * gt_boxes[:, None, 0] + \
            (1 - fac[None, :, 0]) * gt_boxes[:, None, 2]  # (N, P)
        gy = fac[None, :, 1] * gt_boxes[:, None, 1] + \
            (1 - fac[None, :, 1]) * gt_boxes[:, None, 3]
        cx = jnp.floor((gx - x1e[:, None]) /
                       jnp.maximum(we[:, None], 1e-6) * whole)
        cy = jnp.floor((gy - y1e[:, None]) /
                       jnp.maximum(he[:, None], 1e-6) * whole)

        subs = jnp.asarray(np.array(self.sub_regions(), np.float32))  # (P,2)
        xs = jnp.arange(half, dtype=jnp.float32)
        full_x = xs[None, :] + subs[:, 0:1]  # (P, half)
        full_y = xs[None, :] + subs[:, 1:2]
        dx2 = (full_x[None] - cx[..., None])**2  # (N, P, half)
        dy2 = (full_y[None] - cy[..., None])**2
        inside = (dy2[:, :, :, None] + dx2[:, :, None, :]) <= pos_radius**2
        big = (we > self.grid_size) & (he > self.grid_size)
        t = inside & big[:, None, None, None]
        return jnp.transpose(t.astype(jnp.float32), (0, 2, 3, 1))

    def refine_bboxes(self, boxes, heatmap):
        """Score-weighted boundary voting (grid_head.py:297-362).

        boxes (N, 4), heatmap (N, half, half, P) logits -> (N, 4).
        """
        n = boxes.shape[0]
        g, gs, half = self.grid_points, self.grid_size, self.half_size
        prob = jax.nn.sigmoid(heatmap.astype(jnp.float32))
        flat = jnp.transpose(prob, (0, 3, 1, 2)).reshape(n, g, half * half)
        score = jnp.max(flat, axis=-1)  # (N, P)
        pos_idx = jnp.argmax(flat, axis=-1)
        xs = (pos_idx % half).astype(jnp.float32)
        ys = (pos_idx // half).astype(jnp.float32)
        subs = jnp.asarray(np.array(self.sub_regions(), np.float32))
        xs = xs + subs[None, :, 0]
        ys = ys + subs[None, :, 1]

        w = (boxes[:, 2] - boxes[:, 0])[:, None]
        h = (boxes[:, 3] - boxes[:, 1])[:, None]
        x1e = boxes[:, 0][:, None] - w / 2
        y1e = boxes[:, 1][:, None] - h / 2
        # absolute coords on the 2x-expanded box; the whole map is
        # half*2 wide but argmax lives on the half grid of the whole map
        abs_x = (xs + 0.5) / half * w + x1e
        abs_y = (ys + 0.5) / half * h + y1e

        x1_inds = [i for i in range(gs)]
        y1_inds = [i * gs for i in range(gs)]
        x2_inds = [g - gs + i for i in range(gs)]
        y2_inds = [(i + 1) * gs - 1 for i in range(gs)]

        def vote(coord, inds):
            s = score[:, inds]
            return jnp.sum(coord[:, inds] * s, -1) / \
                jnp.maximum(jnp.sum(s, -1), 1e-6)

        return jnp.stack([vote(abs_x, x1_inds), vote(abs_y, y1_inds),
                          vote(abs_x, x2_inds), vote(abs_y, y2_inds)], -1)


@HEADS.register_module()
class GridRoIHead(StandardRoIHead):
    grid_roi_size: int = 14
    grid_points: int = 9
    pos_radius: float = 1.0
    max_num_grid: int = 96
    jitter_amplitude: float = 0.15
    loss_grid_weight: float = 15.0

    def setup(self):
        super().setup()
        self.grid_head = GridHead(grid_points=self.grid_points,
                                  roi_feat_size=self.grid_roi_size,
                                  dtype=self.dtype)

    def _jitter(self, boxes):
        """Deterministic pseudo-random jitter (reference _random_jitter,
        amplitude 0.15): offsets hashed from the box coordinates so the
        pure loss path stays reproducible yet varies across steps."""
        seed = jnp.sin(boxes * jnp.asarray([12.9898, 78.233, 37.719, 9.151]))
        u = (jnp.sum(seed, -1, keepdims=True) * 43758.5453) % 1.0
        off = (jnp.concatenate([u, (u * 7.13) % 1.0, (u * 3.77) % 1.0,
                                (u * 1.93) % 1.0], -1) * 2 - 1) * \
            self.jitter_amplitude
        cxcy = (boxes[:, 2:] + boxes[:, :2]) / 2
        wh = jnp.abs(boxes[:, 2:] - boxes[:, :2])
        new_c = cxcy + wh * off[:, :2]
        new_wh = wh * (1 + off[:, 2:])
        return jnp.concatenate([new_c - new_wh / 2, new_c + new_wh / 2], -1)

    def grid_forward(self, feats, rois, roi_valid, train: bool = False):
        def one(img_feats, r, v):
            return multilevel_roi_align(
                img_feats, r, v, out_size=self.grid_roi_size,
                strides=self.featmap_strides)
        pooled = jax.vmap(one)(tuple(feats[:len(self.featmap_strides)]),
                               rois, roi_valid)
        b, p = pooled.shape[:2]
        flat = pooled.reshape((b * p,) + pooled.shape[2:])
        fused, unfused = self.grid_head(flat, train)
        rs = lambda t: t.reshape((b, p) + t.shape[1:])  # noqa: E731
        return rs(fused), rs(unfused)

    def grid_train(self, feats, rois, pos, labels, targets):
        """Jitter + cap positives, pool 14x14, grid heatmaps + targets.

        Returns (fused, unfused, grid_targets, mask) for grid_loss —
        kept inside the module because the grid head has params.
        """
        b, s = pos.shape
        k = min(self.max_num_grid, s)
        order = jnp.argsort(~pos, axis=1, stable=True)[:, :k]
        sel = lambda t: jnp.take_along_axis(  # noqa: E731
            t, order.reshape(order.shape + (1,) * (t.ndim - 2)), axis=1)
        pos_k = jnp.take_along_axis(pos, order, axis=1)
        rois_k = sel(rois)
        gt_k = self.bbox_coder.decode(rois_k, sel(targets))
        jit_k = jax.vmap(self._jitter)(rois_k)
        jit_k = jax.lax.stop_gradient(jnp.where(pos_k[..., None], jit_k,
                                                rois_k))
        fused, unfused = self.grid_forward(feats, jit_k, pos_k, True)
        gt_tgt = jax.vmap(
            lambda r, g: self.grid_head.get_targets(r, g, self.pos_radius)
        )(jit_k, gt_k)
        return fused, unfused, gt_tgt, pos_k

    def grid_loss(self, fused, unfused, grid_targets, pos_k) -> Dict:
        from .. import losses as L
        w = pos_k[:, :, None, None, None].astype(jnp.float32)
        n = jnp.maximum(jnp.sum(w), 1.0) * \
            float(np.prod(fused.shape[2:]))
        bce_f = L.binary_cross_entropy_with_logits(
            fused.astype(jnp.float32), grid_targets)
        bce_u = L.binary_cross_entropy_with_logits(
            unfused.astype(jnp.float32), grid_targets)
        loss = self.loss_grid_weight * (
            jnp.sum(bce_f * w) + jnp.sum(bce_u * w)) / n
        return dict(loss_grid=loss)

    def loss(self, cls_logits, deltas, labels, targets, pos, sampled,
             rois=None) -> Dict:
        """Classification only (with_reg=False in the reference config)."""
        num_total = jnp.maximum(jnp.sum(sampled.astype(jnp.float32)), 1.0)
        logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return dict(loss_cls=jnp.sum(ce * sampled) / num_total)


@DETECTORS.register_module()
class GridRCNN(TwoStageDetector):
    """Grid R-CNN detector (reference detectors/grid_rcnn.py). Test flow:
    ``__call__`` -> ``get_bboxes`` (cls-score NMS over raw proposals) ->
    ``refine_boxes`` (grid-head voting), mirroring the reference's
    two-pass simple_test (grid_roi_head.py:120-164)."""

    def forward_train(self, img, gt_bboxes, gt_labels, gt_valid):
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
        fused, unfused, gt_tgt, pos_k = self.roi_head.grid_train(
            feats, rois, pos, labels, targets)
        losses.update(self.roi_head.grid_loss(fused, unfused, gt_tgt,
                                              pos_k))
        losses['num_gts'] = jnp.mean(
            jnp.sum(gt_valid.astype(jnp.float32), axis=1))
        return losses

    def get_bboxes(self, outputs, scale_factors=None, **kwargs):
        """Cls-score NMS with boxes == proposals (with_reg=False): zero
        deltas make the coder an identity."""
        proposals, prop_valid, cls_logits, deltas = outputs
        cfg = dict(self.test_cfg or {}).get('rcnn', {})
        nms_cfg = cfg.get('nms', {})
        return self.roi_head.get_bboxes(
            proposals, prop_valid, cls_logits, jnp.zeros_like(proposals),
            scale_factors=scale_factors,
            score_thr=cfg.get('score_thr', 0.05),
            iou_thr=nms_cfg.get('iou_threshold', 0.5),
            max_per_img=cfg.get('max_per_img', 100), **kwargs)

    def refine_boxes(self, img, det_bboxes, det_valid):
        """Grid-head refinement of final detections (second pass)."""
        feats = self.extract_feat(img, train=False)
        fused, _ = self.roi_head.grid_forward(feats, det_bboxes, det_valid,
                                              False)
        refined = jax.vmap(self.roi_head.grid_head.refine_bboxes)(
            det_bboxes, fused)
        h, w = img.shape[1:3]
        refined = jnp.stack([
            jnp.clip(refined[..., 0], 0, w), jnp.clip(refined[..., 1], 0, h),
            jnp.clip(refined[..., 2], 0, w), jnp.clip(refined[..., 3], 0, h),
        ], -1)
        return jnp.where(det_valid[..., None], refined, det_bboxes)
