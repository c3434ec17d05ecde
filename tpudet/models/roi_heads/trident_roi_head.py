"""Trident RoI head + TridentFasterRCNN (reference
mmdet/models/roi_heads/trident_roi_head.py, detectors/trident_faster_rcnn.py).

Training: the backbone concatenates the 3 trident branches along the batch
axis, so the standard RoI path simply sees a 3x batch with the gts tiled
(trident_faster_rcnn.py forward_train repeats gt lists num_branch times).
Testing: a single branch is used (TridentResNet test_branch_idx), so the
standard path applies unchanged; with test_branch_idx=-1 the per-branch
detections are merged by NMS (trident_roi_head.py merge_trident_bboxes —
here: the branches' padded detection sets are concatenated and re-NMSed).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ...registry import DETECTORS, HEADS
from ..detectors.two_stage import TwoStageDetector
from .standard_roi_head import StandardRoIHead


@HEADS.register_module()
class TridentRoIHead(StandardRoIHead):
    num_branch: int = 3


@DETECTORS.register_module()
class TridentFasterRCNN(TwoStageDetector):
    """Faster R-CNN over a TridentResNet backbone: in training the image
    batch is logically tripled by the backbone; gts are tiled to match."""

    def forward_train(self, img, gt_bboxes, gt_labels, gt_valid):
        num_branch = getattr(self.backbone, 'num_branch', 3)
        gt_bboxes = jnp.tile(gt_bboxes, (num_branch, 1, 1))
        gt_labels = jnp.tile(gt_labels, (num_branch, 1))
        gt_valid = jnp.tile(gt_valid, (num_branch, 1))
        return TwoStageDetector.forward_train(self, img, gt_bboxes,
                                              gt_labels, gt_valid)
