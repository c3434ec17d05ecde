"""Proposal-only detectors.

- ``RPN``: Region Proposal Network as a standalone detector (reference
  mmdet/models/detectors/rpn.py). Training is just the RPN head loss;
  inference returns the NMS-filtered proposals as class-agnostic
  detections (label 0), matching the reference's ``simple_test`` which
  hands back raw proposal arrays.
- ``FastRCNN``: two-stage detector with externally supplied proposals
  (reference mmdet/models/detectors/fast_rcnn.py) — no RPN head; the
  caller passes padded ``(B, P, 4)`` proposals + validity both at train
  and test time, mirroring the reference's precomputed-proposal dataflow.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import DETECTORS


@DETECTORS.register_module()
class RPN(nn.Module):
    backbone: nn.Module
    rpn_head: nn.Module
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
        return self.rpn_head(feats, train)

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid):
        # the reference trains RPN with class-agnostic objectness only
        # (rpn.py forward_train passes gt_labels=None)
        return self.rpn_head.loss(preds, gt_bboxes, gt_labels, gt_valid)

    def get_bboxes(self, preds, scale_factors=None, **kwargs):
        cfg = dict(self.test_cfg or {}).get('rpn', self.test_cfg or {})
        props, scores, valid = self.rpn_head.get_proposals(
            preds,
            nms_pre=cfg.get('nms_pre', 1000),
            max_num=cfg.get('max_per_img', 1000),
            iou_thr=cfg.get('nms', {}).get('iou_threshold', 0.7),
            min_bbox_size=cfg.get('min_bbox_size', 0.))
        if scale_factors is not None:
            props = props / scale_factors[:, None, :]
        labels = jnp.zeros(scores.shape, jnp.int32)
        return props, scores, labels, valid


@DETECTORS.register_module()
class FastRCNN(nn.Module):
    backbone: nn.Module
    roi_head: nn.Module
    neck: Optional[nn.Module] = None
    train_cfg: Optional[Dict] = None
    test_cfg: Optional[Dict] = None

    def extract_feat(self, img, train: bool = False):
        x = self.backbone(img, train=train)
        if self.neck is not None:
            x = self.neck(x, train)
        return x

    def __call__(self, img, proposals, prop_valid, train: bool = False):
        feats = self.extract_feat(img, train)
        proposals = jax.lax.stop_gradient(proposals)
        cls_logits, deltas = self.roi_head(feats, proposals, prop_valid,
                                           train)
        return proposals, prop_valid, cls_logits, deltas

    def forward_train(self, img, proposals, prop_valid, gt_bboxes,
                      gt_labels, gt_valid):
        feats = self.extract_feat(img, train=True)
        rois, sampled, labels, targets, pos = self.roi_head.sample_rois(
            proposals, prop_valid, gt_bboxes, gt_labels, gt_valid)
        cls_logits, deltas = self.roi_head(feats, rois, sampled, True)
        losses = self.roi_head.loss(cls_logits, deltas, labels, targets,
                                    pos, sampled, rois=rois)
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
