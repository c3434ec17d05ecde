"""AutoAssign head (reference mmdet/models/dense_heads/autoassign_head.py).

Fully differentiable anchor-free assignment:
- a learned per-class CenterPrior (mean/sigma in stride units) gates each
  point-gt pair (autoassign_head.py:17-121);
- positive loss per gt: confidence-weighted expectation of the joint
  confidence p_pos = p_cls * p_obj * exp(-5*(1-GIoU)) over inside points,
  -log'd (get_pos_loss_single);
- negative loss: every (point, class) is a negative with weight 1, except
  points inside a gt of that class, discounted by the per-gt min-max
  normalized 1/(1-iou) (get_neg_loss_single; where gts of the same class
  overlap the reference's scatter order is replaced by the strongest
  discount);
- center loss regularizes the prior to cover gts: num_gt / sum(prior).
Weights: pos 0.25, neg 0.75, center 0.75.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.bbox import bbox_overlaps_aligned
from ...core.nms import batched_nms
from ...registry import DETECTORS, HEADS
from .. import losses as L
from ..detectors.single_stage import SingleStageDetector

EPS = 1e-12


@HEADS.register_module()
class AutoAssignHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    pos_loss_weight: float = 0.25
    neg_loss_weight: float = 0.75
    center_loss_weight: float = 0.75
    reg_loss_weight: float = 5.0
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        prior_bias = float(-math.log((1 - 0.02) / 0.02))

        def gn_conv(f, name):
            conv = nn.Conv(f, (3, 3), padding='SAME', use_bias=False,
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name=f'{name}_conv')
            gn = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                              name=f'{name}_gn')
            return lambda v: jax.nn.relu(gn(conv(v)))

        cls_tower = [gn_conv(self.feat_channels, f'cls{i}')
                     for i in range(self.stacked_convs)]
        reg_tower = [gn_conv(self.feat_channels, f'reg{i}')
                     for i in range(self.stacked_convs)]
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding='SAME',
                           use_bias=True, dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(prior_bias),
                           name='conv_cls')
        conv_reg = nn.Conv(4, (3, 3), padding='SAME', use_bias=True,
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           # bias 4.0: large initial boxes (autoassign
                           # init_weights)
                           bias_init=nn.initializers.constant(4.0),
                           name='conv_reg')
        conv_obj = nn.Conv(1, (3, 3), padding='SAME', use_bias=True,
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_objectness')
        scales = self.param('scales', nn.initializers.ones,
                            (len(self.strides),))
        # learned center prior (CenterPrior module); returned with the
        # preds so the (pure) loss can consume it with gradients intact
        center_mean = self.param('center_mean', nn.initializers.zeros,
                                 (self.num_classes, 2))
        center_sigma = self.param('center_sigma', nn.initializers.ones,
                                  (self.num_classes, 2))

        cls_out, reg_out, obj_out = [], [], []
        for lvl, x in enumerate(feats):
            c = x
            for conv in cls_tower:
                c = conv(c)
            r = x
            for conv in reg_tower:
                r = conv(r)
            cls_out.append(conv_cls(c))
            reg_out.append(jax.nn.relu(
                conv_reg(r).astype(jnp.float32) * scales[lvl]) *
                self.strides[lvl])
            obj_out.append(conv_obj(r))
        return (tuple(cls_out), tuple(reg_out), tuple(obj_out),
                (center_mean.astype(jnp.float32),
                 center_sigma.astype(jnp.float32)))

    # ------------------------------------------------------------------
    @staticmethod
    def _level_points(featmap_size, stride):
        """AutoAssign removes FCOS's half-stride point offset — points sit
        at ``i * stride`` exactly (autoassign_head.py:173-187)."""
        h, w = featmap_size
        xs = np.arange(w, dtype=np.float32) * stride
        ys = np.arange(h, dtype=np.float32) * stride
        return np.stack([np.tile(xs, h), np.repeat(ys, w)], axis=-1)

    def _points(self, featmap_sizes):
        pts = [self._level_points(featmap_sizes[i], self.strides[i])
               for i in range(len(featmap_sizes))]
        strides = np.concatenate([
            np.full(len(p), self.strides[i], np.float32)
            for i, p in enumerate(pts)])
        return np.concatenate(pts), strides

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        cls_scores, bbox_preds, objectnesses, (center_mean,
                                               center_sigma) = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        pts_np, stride_np = self._points(featmap_sizes)
        points = jnp.asarray(pts_np)  # (P, 2)
        strides = jnp.asarray(stride_np)
        b = cls_scores[0].shape[0]
        C = self.num_classes

        cls_flat = jnp.concatenate([
            c.reshape(b, -1, C).astype(jnp.float32) for c in cls_scores
        ], axis=1)
        reg_flat = jnp.concatenate([
            r.reshape(b, -1, 4).astype(jnp.float32) for r in bbox_preds
        ], axis=1)
        obj_flat = jnp.concatenate([
            o.reshape(b, -1).astype(jnp.float32) for o in objectnesses
        ], axis=1)
        joint = jax.nn.sigmoid(cls_flat) * jax.nn.sigmoid(
            obj_flat)[..., None]  # (B, P, C)

        x1 = points[None, :, 0] - reg_flat[..., 0]
        y1 = points[None, :, 1] - reg_flat[..., 1]
        x2 = points[None, :, 0] + reg_flat[..., 2]
        y2 = points[None, :, 1] + reg_flat[..., 3]
        pred_boxes = jnp.stack([x1, y1, x2, y2], -1)  # (B, P, 4)

        def one_image(joint_i, boxes_i, gts, labels, valid):
            inside = ((points[:, None, 0] > gts[None, :, 0]) &
                      (points[:, None, 0] < gts[None, :, 2]) &
                      (points[:, None, 1] > gts[None, :, 1]) &
                      (points[:, None, 1] < gts[None, :, 3]) &
                      valid[None, :])  # (P, G)
            g_cx = (gts[:, 0] + gts[:, 2]) / 2
            g_cy = (gts[:, 1] + gts[:, 3]) / 2
            mean = center_mean[labels]  # (G, 2)
            sigma = center_sigma[labels]
            dx = (points[:, None, 0] - g_cx[None]) / strides[:, None] - \
                mean[None, :, 0]
            dy = (points[:, None, 1] - g_cy[None]) / strides[:, None] - \
                mean[None, :, 1]
            prior = jnp.exp(-dx**2 / (2 * sigma[None, :, 0]**2)) * \
                jnp.exp(-dy**2 / (2 * sigma[None, :, 1]**2))
            prior = jnp.where(inside, prior, 0.)  # (P, G)

            giou = bbox_overlaps_aligned(
                boxes_i[:, None].repeat(gts.shape[0], 1),
                jnp.broadcast_to(gts[None], (points.shape[0],) + gts.shape),
                mode='giou')  # (P, G)
            reg_loss = self.reg_loss_weight * (1.0 - giou)
            ious = bbox_overlaps_aligned(
                boxes_i[:, None].repeat(gts.shape[0], 1),
                jnp.broadcast_to(gts[None], (points.shape[0],) + gts.shape))

            # positive loss per gt
            p_loc = jnp.exp(-reg_loss)
            p_cls = jnp.take_along_axis(
                joint_i, jnp.clip(labels, 0, C - 1)[None, :].repeat(
                    points.shape[0], 0), axis=1)  # (P, G)
            p_pos = p_cls * p_loc
            conf_w = jnp.exp(p_pos * 3) * prior
            conf_w = conf_w / jnp.clip(jnp.sum(conf_w, axis=0,
                                               keepdims=True), EPS, None)
            rew = jnp.sum(p_pos * conf_w, axis=0)  # (G,)
            pos_l = -jnp.log(jnp.clip(rew, EPS, 1.0)) * valid
            pos_loss = jnp.sum(pos_l)

            # negative weights (autoassign_head.py:258-310): the pair iou
            # is the per-point MAX over gts replicated across pairs and
            # masked by inside; min-max normalized 1/(1-iou) per gt over
            # its inside points; constant wrt params (the reference builds
            # it under no_grad), masked with +-inf rather than NaN
            # (0 * NaN = NaN in the VJP poisoned every gradient)
            iou_pt = jnp.max(jnp.where(valid[None, :], ious, 0.), axis=1,
                             keepdims=True)  # (P, 1)
            t = 1.0 / jnp.clip(1.0 - jax.lax.stop_gradient(iou_pt),
                               EPS, None)
            t = jnp.broadcast_to(t, inside.shape)  # (P, G)
            tmin = jnp.min(jnp.where(inside, t, jnp.inf), axis=0,
                           keepdims=True)
            tmax = jnp.max(jnp.where(inside, t, -jnp.inf), axis=0,
                           keepdims=True)
            has_inside = jnp.any(inside, axis=0, keepdims=True)
            tn = jnp.where(
                has_inside,
                (t - tmin + EPS) / (tmax - tmin + EPS), 0.)
            tn = jnp.where(inside, tn, 0.)  # (P, G)
            # the reference scatters (point, gt_label) <- 1-tn in gt-major
            # order (last write wins): keep the HIGHEST-indexed covering
            # gt per (point, class) via a rank scatter-max
            num_g = labels.shape[0]
            gt_rank = jnp.arange(1, num_g + 1, dtype=jnp.int32)
            rank_key = jnp.where(inside & valid[None, :], gt_rank[None, :],
                                 0)
            sel = jnp.zeros((points.shape[0], C), jnp.int32)
            sel = sel.at[:, labels].max(rank_key)
            discount = jnp.where(
                sel > 0,
                jnp.take_along_axis(tn, jnp.maximum(sel - 1, 0), axis=1),
                0.)
            w_neg = 1.0 - discount  # (P, C)
            z = joint_i * w_neg
            neg_loss = jnp.sum(z**2 * (-jnp.log(jnp.clip(1 - z, EPS, None))))

            num_gt = jnp.sum(valid.astype(jnp.float32))
            prior_sum = jnp.sum(prior)
            center_l = jnp.where(prior_sum > 0,
                                 num_gt / jnp.clip(prior_sum, EPS, None),
                                 0.)
            return pos_loss, neg_loss, center_l, num_gt, prior_sum

        pos_l, neg_l, center_l, n_gt, prior_sums = jax.vmap(one_image)(
            joint, pred_boxes, gt_bboxes, gt_labels, gt_valid)
        num_gts = jnp.maximum(jnp.sum(n_gt), 1.0)
        neg_avg = jnp.maximum(jnp.sum(prior_sums), 1.0)
        return dict(
            loss_pos=self.pos_loss_weight * jnp.sum(pos_l) / num_gts,
            loss_neg=self.neg_loss_weight * jnp.sum(neg_l) / neg_avg,
            loss_center=self.center_loss_weight * jnp.mean(center_l),
            num_gts=jnp.mean(n_gt))

    # ------------------------------------------------------------------
    def get_bboxes(self, preds, scale_factors=None, score_thr: float = 0.05,
                   iou_thr: float = 0.6, max_per_img: int = 100,
                   nms_pre: int = 1000, **kwargs):
        cls_scores, bbox_preds, objectnesses = preds[:3]
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        b = cls_scores[0].shape[0]
        boxes_all, scores_all = [], []
        for lvl in range(len(cls_scores)):
            pts = jnp.asarray(self._level_points(featmap_sizes[lvl],
                                                 self.strides[lvl]))
            scores = jax.nn.sigmoid(
                cls_scores[lvl].reshape(b, -1, self.num_classes).astype(
                    jnp.float32))
            obj = jax.nn.sigmoid(
                objectnesses[lvl].reshape(b, -1).astype(jnp.float32))
            scores = scores * obj[..., None]
            ltrb = bbox_preds[lvl].reshape(b, -1, 4).astype(jnp.float32)
            k = min(nms_pre, scores.shape[1])
            if 0 < k < scores.shape[1]:
                max_s = jnp.max(scores, axis=-1)
                _, topk = jax.lax.top_k(max_s, k)
                scores = jnp.take_along_axis(scores, topk[..., None], axis=1)
                ltrb = jnp.take_along_axis(ltrb, topk[..., None], axis=1)
                sel = pts[topk]
            else:
                sel = jnp.broadcast_to(pts[None], (b,) + pts.shape)
            boxes_all.append(jnp.stack([
                sel[..., 0] - ltrb[..., 0], sel[..., 1] - ltrb[..., 1],
                sel[..., 0] + ltrb[..., 2], sel[..., 1] + ltrb[..., 3]], -1))
            scores_all.append(scores)
        bbox = jnp.concatenate(boxes_all, axis=1)
        scores = jnp.concatenate(scores_all, axis=1)
        if scale_factors is not None:
            bbox = bbox / scale_factors[:, None, :]
        return batched_nms(bbox, scores, score_thr, iou_thr, max_per_img,
                           nms_pre=2048)


@DETECTORS.register_module()
class AutoAssign(SingleStageDetector):
    """AutoAssign detector (reference mmdet/models/detectors/autoassign.py).

    The learned center prior rides along in the head outputs, so the
    standard (pure) loss path keeps its gradients."""

    def get_bboxes(self, pred_maps, **kwargs):
        cfg = dict(self.test_cfg or {})
        nms_cfg = cfg.pop('nms', None)
        if nms_cfg is not None:
            cfg['iou_thr'] = nms_cfg.get('iou_threshold', 0.6)
        cfg.pop('min_bbox_size', None)
        cfg.update(kwargs)
        return self.bbox_head.get_bboxes(pred_maps, **cfg)
