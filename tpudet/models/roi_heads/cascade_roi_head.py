"""Cascade R-CNN roi head + detector (reference mmdet/models/roi_heads/
cascade_roi_head.py, detectors/cascade_rcnn.py): three bbox heads trained
at increasing IoU thresholds (0.5/0.6/0.7) with tightening delta stds;
each stage refines the previous stage's boxes, and test-time class scores
average across stages.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.assigners import max_iou_assign
from ...core.bbox import DeltaXYWHBBoxCoder
from ...registry import DETECTORS, HEADS
from ..detectors.two_stage import TwoStageDetector
from .bbox_head import Shared2FCBBoxHead
from .standard_roi_head import StandardRoIHead

STAGE_IOUS = (0.5, 0.6, 0.7)
STAGE_STDS = ((0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
              (0.033, 0.033, 0.067, 0.067))
STAGE_WEIGHTS = (1.0, 0.5, 0.25)


@HEADS.register_module()
class CascadeRoIHead(StandardRoIHead):
    num_stages: int = 3
    # reference cascade stages use SmoothL1(beta=1), not Faster R-CNN's
    # plain L1 (cascade_rcnn_r50_fpn.py loss_bbox per stage)
    loss_bbox_type: str = 'smooth_l1'

    def setup(self):
        self.bbox_heads = [
            Shared2FCBBoxHead(
                num_classes=self.num_classes, in_channels=self.in_channels,
                roi_feat_size=self.roi_size,
                # cascade regresses class-agnostic deltas (reference
                # cascade config: reg_class_agnostic=True)
                reg_class_agnostic=True,
                target_stds=STAGE_STDS[i], dtype=self.dtype,
                name=f'bbox_head{i}')
            for i in range(self.num_stages)
        ]

    def stage_coder(self, stage):
        return DeltaXYWHBBoxCoder(target_stds=STAGE_STDS[stage])

    def run_stage(self, stage, feats, rois, roi_valid, train: bool = False):
        pooled = self.extract(feats, rois, roi_valid)
        return self.bbox_heads[stage](pooled, train)

    def refine(self, stage, rois, deltas, img_shape=None):
        return self.stage_coder(stage).decode(rois, deltas, img_shape)

    def stage_targets(self, stage, rois, roi_valid, gt_bboxes, gt_labels,
                      gt_valid):
        """Assignment at the stage's IoU threshold; all valid rois are
        used (cascade re-samples only at stage 0 in the reference; later
        stages take the refined boxes as-is)."""
        thr = STAGE_IOUS[stage]

        def one(r, v, g, gv):
            # reference cascade rcnn assigners set match_low_quality=False
            # at EVERY stage (cascade_rcnn_r50_fpn.py:127,143,159)
            a = max_iou_assign(r, g, gv, thr, thr, thr, False)
            return jnp.where(v, a, -2)

        assigned = jax.vmap(one)(rois, roi_valid, gt_bboxes, gt_valid)
        pos = assigned >= 0
        sampled = (assigned >= 0) | (assigned == -1)
        gt_idx = jnp.clip(assigned, 0, None)
        labels = jnp.where(pos,
                           jnp.take_along_axis(gt_labels, gt_idx, axis=1),
                           self.num_classes)
        matched = jnp.take_along_axis(gt_bboxes, gt_idx[..., None], axis=1)
        matched = jnp.where(pos[..., None], matched, rois)
        targets = self.stage_coder(stage).encode(rois, matched)
        return sampled, labels, targets, pos


@DETECTORS.register_module()
class CascadeRCNN(TwoStageDetector):
    """Cascade R-CNN (reference detectors/cascade_rcnn.py)."""

    def __call__(self, img, train: bool = False):
        feats = self.extract_feat(img, train)
        rpn_preds = self.rpn_head(feats, train)
        cfg = dict(self.test_cfg or {}).get('rpn', {})
        rois, _, roi_valid = self.rpn_head.get_proposals(
            rpn_preds, img_shape=img.shape[1:3],
            nms_pre=cfg.get('nms_pre', 1000),
            max_num=cfg.get('max_per_img', 1000),
            iou_thr=cfg.get('nms', {}).get('iou_threshold', 0.7))
        rois = jax.lax.stop_gradient(rois)

        cls_sum = 0.
        for stage in range(self.roi_head.num_stages):
            cls_logits, deltas = self.roi_head.run_stage(
                stage, feats, rois, roi_valid, train)
            cls_sum = cls_sum + jax.nn.softmax(
                cls_logits.astype(jnp.float32), axis=-1)
            if stage < self.roi_head.num_stages - 1:
                rois = self.roi_head.refine(stage, rois,
                                            deltas.astype(jnp.float32),
                                            img.shape[1:3])
        avg_scores = cls_sum / self.roi_head.num_stages
        # final boxes from the LAST stage's regression; average scores
        # (reference cascade test logic); image shape rides along so
        # get_bboxes can clip the final decode like every other stage
        img_hw = jnp.asarray(img.shape[1:3], jnp.float32)
        return rois, roi_valid, avg_scores, deltas, img_hw

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

        rois, sampled0, labels, targets, pos, is_gt = \
            self.roi_head.sample_rois(proposals, prop_valid, gt_bboxes,
                                      gt_labels, gt_valid,
                                      return_is_gt=True)
        roi_valid = sampled0
        for stage in range(self.roi_head.num_stages):
            cls_logits, deltas = self.roi_head.run_stage(
                stage, feats, rois, roi_valid, True)
            if stage == 0:
                sampled, st_labels, st_targets, st_pos = (
                    sampled0, labels, targets, pos)
            else:
                sampled, st_labels, st_targets, st_pos = \
                    self.roi_head.stage_targets(stage, rois, roi_valid,
                                                gt_bboxes, gt_labels,
                                                gt_valid)
            stage_losses = self.roi_head.loss(
                cls_logits, deltas, st_labels, st_targets, st_pos, sampled)
            w = STAGE_WEIGHTS[stage]
            losses[f'loss_cls_s{stage}'] = stage_losses['loss_cls'] * w
            losses[f'loss_bbox_s{stage}'] = stage_losses['loss_bbox'] * w
            if stage < self.roi_head.num_stages - 1:
                refined = jax.lax.stop_gradient(
                    self.roi_head.refine(stage, rois,
                                         deltas.astype(jnp.float32),
                                         img.shape[1:3]))
                # the reference drops gt-origin rois when refining
                # (bbox_head.py:420 refine_bboxes keep = 1 - pos_is_gts)
                # and the next stage's RandomSampler re-appends the fresh
                # gt boxes (cascade cfg add_gt_as_proposals=True at every
                # stage) — net effect: gt slots stay the pristine gt
                # boxes, everything else is refined
                rois = jnp.where(is_gt[..., None], rois, refined)
        losses['num_gts'] = jnp.mean(
            jnp.sum(gt_valid.astype(jnp.float32), axis=1))
        return losses

    def get_bboxes(self, outputs, scale_factors=None, **kwargs):
        rois, roi_valid, avg_scores, last_deltas, img_hw = outputs
        cfg = dict(self.test_cfg or {}).get('rcnn', {})
        nms_cfg = cfg.get('nms', {})
        # decode the last stage on the (already twice-refined) rois,
        # clipped to the image like every intermediate refine
        from ...core.nms import NEG_INF, NMSResult, nms_padded
        last_stage = self.roi_head.num_stages - 1
        boxes = self.roi_head.refine(last_stage, rois,
                                     last_deltas.astype(jnp.float32),
                                     img_shape=img_hw)
        scores = avg_scores[..., :-1] * roi_valid[..., None]
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, :]
        score_thr = cfg.get('score_thr', 0.05)
        iou_thr = nms_cfg.get('iou_threshold', 0.5)
        max_per_img = cfg.get('max_per_img', 100)
        num_classes = self.roi_head.num_classes

        def one(bx, sc):
            flat = sc.reshape(-1)
            labels = jnp.tile(jnp.arange(num_classes, dtype=jnp.int32),
                              bx.shape[0])
            box_rep = jnp.repeat(bx, num_classes, axis=0)
            valid = flat > score_thr
            k = min(2048, flat.shape[0])
            top_s, top_i = jax.lax.top_k(jnp.where(valid, flat, NEG_INF), k)
            top_valid = top_s > NEG_INF / 2
            cand = box_rep[top_i]
            lab = labels[top_i]
            max_coord = jnp.max(jnp.where(top_valid[:, None], cand, 0.))
            off = cand + (lab.astype(cand.dtype) * (max_coord + 1.))[:, None]
            keep_idx, keep_valid = nms_padded(off, top_s, iou_thr,
                                              max_per_img, top_valid)
            return NMSResult(
                jnp.where(keep_valid[:, None], cand[keep_idx], 0.),
                jnp.where(keep_valid, top_s[keep_idx], 0.),
                jnp.where(keep_valid, lab[keep_idx], -1), keep_valid)

        return jax.vmap(one)(boxes, scores)