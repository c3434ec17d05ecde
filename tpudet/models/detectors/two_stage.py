"""Two-stage detector (Faster R-CNN) — reference
mmdet/models/detectors/two_stage.py + faster_rcnn.py.

Unlike the single-stage path (pure loss/get_bboxes outside apply), the RoI
head consumes proposals that depend on RPN outputs AND has its own
parameters, so the full pipeline runs inside module methods:

- ``__call__(img)``: feats -> RPN -> proposals (test-cfg NMS) -> RoI head
  -> (proposals, valid, cls_logits, deltas): everything get_bboxes needs;
- ``forward_train(img, gts...)``: RPN loss + train-cfg proposals
  (stop-gradient, reference detaches proposals too) + static roi sampling
  + RoI losses, returning the loss dict directly.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import DETECTORS


@DETECTORS.register_module()
class TwoStageDetector(nn.Module):
    backbone: nn.Module
    rpn_head: nn.Module
    roi_head: nn.Module
    neck: Optional[nn.Module] = None
    train_cfg: Optional[Dict] = None
    test_cfg: Optional[Dict] = None

    def extract_feat(self, img, train: bool = False):
        x = self.backbone(img, train=train)
        if self.neck is not None:
            x = self.neck(x, train)
        return x

    def __call__(self, img, train: bool = False):
        feats = self.extract_feat(img, train)
        rpn_preds = self.rpn_head(feats, train)
        cfg = dict(self.test_cfg or {}).get('rpn', {})
        proposals, _, prop_valid = self.rpn_head.get_proposals(
            rpn_preds,
            img_shape=img.shape[1:3],
            nms_pre=cfg.get('nms_pre', 1000),
            max_num=cfg.get('max_per_img', 1000),
            iou_thr=cfg.get('nms', {}).get('iou_threshold', 0.7))
        proposals = jax.lax.stop_gradient(proposals)
        cls_logits, deltas = self.roi_head(feats, proposals, prop_valid,
                                           train)
        return proposals, prop_valid, cls_logits, deltas

    def forward_train(self, img, gt_bboxes, gt_labels, gt_valid):
        feats = self.extract_feat(img, train=True)
        rpn_preds = self.rpn_head(feats, train=True)
        losses = self.rpn_head.loss(rpn_preds, gt_bboxes, gt_labels,
                                    gt_valid)

        cfg = dict(self.train_cfg or {}).get('rpn_proposal', {})
        proposals, _, prop_valid = self.rpn_head.get_proposals(
            rpn_preds,
            img_shape=img.shape[1:3],
            nms_pre=cfg.get('nms_pre', 2000),
            max_num=cfg.get('max_per_img', 1000),
            iou_thr=cfg.get('nms', {}).get('iou_threshold', 0.7))
        proposals = jax.lax.stop_gradient(proposals)

        rois, sampled, labels, targets, pos = self.roi_head.sample_rois(
            proposals, prop_valid, gt_bboxes, gt_labels, gt_valid)
        cls_logits, deltas = self.roi_head(feats, rois, sampled, True)
        roi_losses = self.roi_head.loss(cls_logits, deltas, labels, targets,
                                        pos, sampled, rois=rois)
        losses.update(roi_losses)
        losses['num_gts'] = jnp.mean(
            jnp.sum(gt_valid.astype(jnp.float32), axis=1))
        return losses

    def get_bboxes(self, outputs, scale_factors=None, **kwargs):
        proposals, prop_valid, cls_logits, deltas = outputs
        cfg = dict(self.test_cfg or {}).get('rcnn', {})
        nms_cfg = cfg.get('nms', {})
        return self.roi_head.get_bboxes(
            proposals, prop_valid, cls_logits, deltas,
            scale_factors=scale_factors,
            score_thr=cfg.get('score_thr', 0.05),
            iou_thr=nms_cfg.get('iou_threshold', 0.5),
            max_per_img=cfg.get('max_per_img', 100), **kwargs)


@DETECTORS.register_module()
class FasterRCNN(TwoStageDetector):
    """Named alias (reference mmdet/models/detectors/faster_rcnn.py)."""
