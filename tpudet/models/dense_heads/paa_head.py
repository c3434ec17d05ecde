"""PAA head (reference mmdet/models/dense_heads/paa_head.py:45).

Probabilistic Anchor Assignment over the ATSS head structure:
1. loose MaxIoU candidates (pos/neg thr 0.1);
2. per (gt, level) keep the ``topk`` lowest-loss candidates (loss = focal
   cls + GIoU of the decoded box, paa_head.get_pos_loss);
3. fit a 2-component 1-D GMM to each gt's candidate losses (fixed-iteration
   EM replaces sklearn, means init [min, max], weights 0.5) and keep the
   sorted prefix up to the max-likelihood sample of the low-loss component
   (separation scheme (c), paa_head.py:366-400);
4. losses: focal cls (avg num_pos), GIoU weighted by the decoded IoU
   (avg = sum IoU), BCE IoU branch; score at test = sqrt(cls * iou).
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.assigners import max_iou_assign_batch
from ...core.bbox import bbox_overlaps_aligned
from ...core.nms import batched_nms
from ...registry import DETECTORS, HEADS
from .. import losses as L
from ..detectors.single_stage import SingleStageDetector
from .atss_head import ATSSHead

INF = 1e8
EPS = 1e-8


def gmm_em_1d(x, valid, iters: int = 100, tol: float = 1e-3,
              reg_covar: float = 1e-6):
    """2-component 1-D EM on masked data, mirroring the reference's
    sklearn GaussianMixture call (paa_head.py:326-348): means init at
    (min, max), weights (.5, .5), unit variances (precisions_init 1.0),
    ``reg_covar`` added to the M-step variance, and sklearn's early
    stopping (max_iter=100, tol=1e-3 on the mean log-likelihood).

    Returns (means (2,), assign (K,) int with 0 = lower-mean component,
    score (K,) mixture log-likelihood per sample)."""
    v = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(v), 1.0)
    m0 = jnp.min(jnp.where(valid, x, INF))
    m1 = jnp.max(jnp.where(valid, x, -INF))
    mean = jnp.stack([m0, m1])
    var = jnp.asarray([1.0, 1.0])
    w = jnp.asarray([0.5, 0.5])

    def e_logp(mean, var, w):
        return (-0.5 * (x[:, None] - mean[None])**2 / var[None] -
                0.5 * jnp.log(2 * jnp.pi * var[None]) +
                jnp.log(jnp.clip(w[None], EPS, None)))  # (K, 2)

    # sklearn convergence: iterate e-step -> m-step until the mean
    # per-sample log-likelihood moves < tol, then STOP — the split is
    # taken at that early-stopped point, not at the EM fixed point
    def cond(state):
        _, _, _, lb_prev, lb_cur, it = state
        return (it < iters) & (jnp.abs(lb_cur - lb_prev) >= tol)

    def body(state):
        mean, var, w, _, lb_cur, it = state
        logp = e_logp(mean, var, w)
        log_norm = jax.nn.logsumexp(logp, axis=1)
        lb_new = jnp.sum(log_norm * v) / n
        r = jax.nn.softmax(logp, axis=1) * v[:, None]
        nk = jnp.maximum(jnp.sum(r, axis=0), EPS)
        mean = jnp.sum(r * x[:, None], axis=0) / nk
        var = jnp.sum(r * (x[:, None] - mean[None])**2,
                      axis=0) / nk + reg_covar
        w = nk / n
        return (mean, var, w, lb_cur, lb_new, it + 1)

    mean, var, w, _, _, _ = jax.lax.while_loop(
        cond, body, (mean, var, w, jnp.inf, -jnp.inf, 0))
    logp = e_logp(mean, var, w)
    # component 0 = lower mean
    order = jnp.argsort(mean)
    logp = logp[:, order]
    assign = jnp.argmax(logp, axis=1).astype(jnp.int32)
    score = jax.nn.logsumexp(logp, axis=1)
    return mean[order], assign, score


@HEADS.register_module()
class PAAHead(ATSSHead):
    pos_iou_thr_init: float = 0.1
    paa_topk: int = 9
    # the published PAA recipe's loss weights (reference
    # configs/paa/paa_r50_fpn_1x_coco.py:49-51), overriding ATSS's 2.0/1.0
    loss_bbox_weight: float = 1.3
    loss_iou_weight: float = 0.5

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        cls_scores, bbox_preds, iou_preds = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        anchors_np, counts = self._anchors_and_counts(featmap_sizes)
        anchors = jnp.asarray(anchors_np)
        level_id = jnp.asarray(np.concatenate([
            np.full(c, i, np.int32) for i, c in enumerate(counts)]))
        num_levels = len(counts)
        b = cls_scores[0].shape[0]
        C = self.num_classes
        G = gt_bboxes.shape[1]

        cls_flat = jnp.concatenate([
            c.reshape(b, -1, C).astype(jnp.float32) for c in cls_scores
        ], axis=1)
        reg_flat = jnp.concatenate([
            r.reshape(b, -1, 4).astype(jnp.float32) for r in bbox_preds
        ], axis=1)
        iou_flat = jnp.concatenate([
            c.reshape(b, -1).astype(jnp.float32) for c in iou_preds
        ], axis=1)
        # DeltaXYWH decode from anchors (reference PAA shares ATSS's coder,
        # configs/paa/paa_r50_fpn_1x_coco.py bbox_coder stds .1/.2)
        pred_boxes = self.bbox_coder.decode(anchors[None], reg_flat)

        # 1. loose candidates
        # MaxIoU(0.1, 0.1, min_pos_iou=0) per the published recipe
        # (configs/paa/paa_r50_fpn_1x_coco.py:54-59)
        assigned = max_iou_assign_batch(anchors, gt_bboxes, gt_valid,
                                        self.pos_iou_thr_init,
                                        self.pos_iou_thr_init, 0.0, True)
        cand = assigned >= 0
        gt_idx = jnp.clip(assigned, 0, None)
        matched = jnp.take_along_axis(gt_bboxes, gt_idx[..., None], axis=1)

        # 2. per-anchor candidate loss (no grad; paa_head.get_pos_loss)
        lab = jnp.take_along_axis(gt_labels, gt_idx, axis=1)
        onehot = jax.nn.one_hot(lab, C)
        el_cls = jnp.sum(L.sigmoid_focal_loss(
            cls_flat, onehot, gamma=self.focal_gamma, alpha=self.focal_alpha,
            reduction='none'), -1)
        # the candidate bbox loss carries the GIoU loss_weight
        # (paa_head.py:246-254: self.loss_bbox with reduction 'none')
        el_box = self.loss_bbox_weight * (1.0 - bbox_overlaps_aligned(
            pred_boxes, jnp.where(cand[..., None], matched, pred_boxes),
            mode='giou'))
        pos_loss = jax.lax.stop_gradient(el_cls + el_box)

        # 3. per (img, gt): topk per level -> GMM -> prefix positives
        K = self.paa_topk

        def reassign_one(loss_a, cand_a, gidx_a):
            # (A,) -> per gt boolean of final positivity
            def per_gt(g):
                mine = cand_a & (gidx_a == g)  # (A,)
                outs = []
                for lvl in range(num_levels):
                    sel = mine & (level_id == lvl)
                    masked = jnp.where(sel, loss_a, INF)
                    vals, idxs = jax.lax.top_k(-masked, K)
                    outs.append((-vals, idxs))
                losses = jnp.concatenate([o[0] for o in outs])
                idxs = jnp.concatenate([o[1] for o in outs])
                valid = losses < INF / 2
                # the reference sorts candidates by loss before the GMM and
                # keeps the comp-0 PREFIX up to its best-scoring sample
                # (paa_head.py:322-325, gmm_separation_scheme); gts with
                # fewer than 2 candidates keep none (paa_head.py:320)
                order = jnp.argsort(jnp.where(valid, losses, INF))
                s_losses = jnp.take(losses, order)
                s_valid = jnp.take(valid, order)
                s_idxs = jnp.take(idxs, order)
                _, assign, score = gmm_em_1d(
                    jnp.where(s_valid, s_losses, 0.), s_valid)
                comp0 = (assign == 0) & s_valid
                best = jnp.argmax(jnp.where(comp0, score, -INF))
                rank = jnp.arange(comp0.shape[0])
                keep = comp0 & (rank <= best) & jnp.any(comp0)
                keep = keep & (jnp.sum(valid.astype(jnp.int32)) >= 2)
                mask = jnp.zeros(loss_a.shape[0], bool).at[s_idxs].max(keep)
                return mask & mine

            masks = jax.vmap(per_gt)(jnp.arange(G, dtype=jnp.int32))
            return jnp.any(masks, axis=0)

        pos = jax.vmap(reassign_one)(pos_loss, cand, gt_idx)
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)

        labels = jnp.where(pos, lab, C)
        onehot_pos = jax.nn.one_hot(labels, C)  # bg rows are all-zero
        # cls avg_factor is max(num_pos, num_images) (paa_head.py:177)
        loss_cls = L.sigmoid_focal_loss(
            cls_flat, onehot_pos, gamma=self.focal_gamma,
            alpha=self.focal_alpha,
            avg_factor=jnp.maximum(num_pos, float(b)))

        iou_tgt = bbox_overlaps_aligned(
            pred_boxes, jnp.where(pos[..., None], matched, pred_boxes))
        iou_tgt = jax.lax.stop_gradient(jnp.clip(iou_tgt, EPS, None)) * pos
        loss_bbox = L.giou_loss(
            pred_boxes, jnp.where(pos[..., None], matched, pred_boxes),
            weight=iou_tgt, avg_factor=jnp.maximum(jnp.sum(iou_tgt), EPS),
            loss_weight=self.loss_bbox_weight)
        loss_iou = L.bce_loss(iou_flat, iou_tgt,
                              weight=pos.astype(jnp.float32),
                              avg_factor=num_pos,
                              loss_weight=self.loss_iou_weight)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_iou=loss_iou,
                    num_gts=jnp.mean(jnp.sum(gt_valid.astype(jnp.float32),
                                             axis=1)))

    # ------------------------------------------------------------------
    def get_bboxes(self, preds, scale_factors=None, score_thr: float = 0.05,
                   iou_thr: float = 0.6, max_per_img: int = 100,
                   nms_pre: int = 1000, **kwargs):
        cls_scores, bbox_preds, iou_preds = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        per_level = self.anchor_generator.grid_anchors(featmap_sizes)
        b = cls_scores[0].shape[0]
        boxes_all, scores_all = [], []
        for lvl in range(len(cls_scores)):
            anchors = jnp.asarray(per_level[lvl])
            scores = jax.nn.sigmoid(
                cls_scores[lvl].reshape(b, -1, self.num_classes).astype(
                    jnp.float32))
            iou_p = jax.nn.sigmoid(
                iou_preds[lvl].reshape(b, -1).astype(jnp.float32))
            # PAA score: sqrt(cls * iou) (paa_head._get_bboxes score_voting
            # base scores)
            scores = jnp.sqrt(jnp.clip(scores * iou_p[..., None], 0., 1.))
            deltas = bbox_preds[lvl].reshape(b, -1, 4).astype(jnp.float32)
            k = min(nms_pre, scores.shape[1])
            if 0 < k < scores.shape[1]:
                max_s = jnp.max(scores, axis=-1)
                _, topk = jax.lax.top_k(max_s, k)
                scores = jnp.take_along_axis(scores, topk[..., None], axis=1)
                deltas = jnp.take_along_axis(deltas, topk[..., None], axis=1)
                sel_anchors = anchors[topk]
            else:
                sel_anchors = jnp.broadcast_to(anchors[None],
                                               (b,) + anchors.shape)
            boxes_all.append(self.bbox_coder.decode(sel_anchors, deltas))
            scores_all.append(scores)
        bbox = jnp.concatenate(boxes_all, axis=1)
        scores = jnp.concatenate(scores_all, axis=1)
        if scale_factors is not None:
            bbox = bbox / scale_factors[:, None, :]
        return batched_nms(bbox, scores, score_thr, iou_thr, max_per_img,
                           nms_pre=2048)


@DETECTORS.register_module()
class PAA(SingleStageDetector):
    """PAA detector (reference mmdet/models/detectors/paa.py)."""

    def get_bboxes(self, pred_maps, **kwargs):
        cfg = dict(self.test_cfg or {})
        nms_cfg = cfg.pop('nms', None)
        if nms_cfg is not None:
            cfg['iou_thr'] = nms_cfg.get('iou_threshold', 0.6)
        cfg.pop('min_bbox_size', None)
        cfg.pop('score_voting', None)
        cfg.update(kwargs)
        return self.bbox_head.get_bboxes(pred_maps, **cfg)
