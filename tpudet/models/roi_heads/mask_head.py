"""FCN mask head + Mask R-CNN roi head (reference mmdet/models/roi_heads/
mask_heads/fcn_mask_head.py, detectors/mask_rcnn.py).

The mask branch pools 14x14 RoI features, runs 4 convs + a 2x deconv + a
1x1 per-class logit conv (28x28 outputs). Training targets come from the
static gt-frame mask representation (tpudet/core/mask.py).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.mask import mask_targets_from_gt_frame
from ...registry import DETECTORS, HEADS
from .. import losses as L
from ..detectors.two_stage import TwoStageDetector
from .standard_roi_head import StandardRoIHead


@HEADS.register_module()
class FCNMaskHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    conv_out_channels: int = 256
    num_convs: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_feats, train: bool = False):
        """(..., 14, 14, C) -> (..., 28, 28, num_classes) logits."""
        x = roi_feats
        for i in range(self.num_convs):
            x = jax.nn.relu(
                nn.Conv(self.conv_out_channels, (3, 3), padding='SAME',
                        dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=f'conv{i}')(x))
        x = jax.nn.relu(
            nn.ConvTranspose(self.conv_out_channels, (2, 2), (2, 2),
                             dtype=self.dtype,
                             kernel_init=nn.initializers.he_normal(),
                             name='upsample')(x))
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.001),
                       name='conv_logits')(x)


@HEADS.register_module()
class MaskRoIHead(StandardRoIHead):
    """StandardRoIHead + mask branch (reference StandardRoIHead with
    mask_head configured)."""
    mask_size: int = 28

    def setup(self):
        super().setup()
        self.mask_head = FCNMaskHead(num_classes=self.num_classes,
                                     in_channels=self.in_channels,
                                     dtype=self.dtype)

    def mask_forward(self, feats, rois, roi_valid, train: bool = False):
        # mask branch pools its own 14x14 features (reference
        # mask_roi_extractor output_size=14)
        pooled = self.extract(feats, rois, roi_valid, out_size=14)
        b, p = pooled.shape[:2]
        x = pooled.reshape((b * p,) + pooled.shape[2:])
        logits = self.mask_head(x, train)
        return logits.reshape((b, p) + logits.shape[1:])

    def mask_loss(self, mask_logits, rois, pos, gt_idx, gt_boxes,
                  gt_frame_masks, labels) -> Dict:
        """BCE on the matched-class mask channel over positive rois."""
        b, p = rois.shape[:2]

        def one(logits_i, rois_i, pos_i, gt_idx_i, gt_boxes_i, gfm_i,
                labels_i):
            matched_masks = gfm_i[gt_idx_i]  # (P, S, S)
            matched_boxes = gt_boxes_i[gt_idx_i]
            targets = mask_targets_from_gt_frame(
                matched_masks, matched_boxes, rois_i, self.mask_size)
            cls_idx = jnp.clip(labels_i, 0, self.num_classes - 1)
            per_roi = jnp.take_along_axis(
                logits_i, cls_idx[:, None, None, None], axis=-1)[..., 0]
            bce = L.binary_cross_entropy_with_logits(
                per_roi, jnp.clip(targets, 0., 1.))
            return jnp.sum(bce * pos_i[:, None, None]), jnp.sum(pos_i)

        sums, counts = jax.vmap(one)(mask_logits, rois,
                                     pos.astype(jnp.float32), jnp.clip(
                                         gt_idx, 0, None),
                                     gt_boxes, gt_frame_masks, labels)
        denom = jnp.maximum(jnp.sum(counts), 1.0) * self.mask_size**2
        return dict(loss_mask=jnp.sum(sums) / denom)


@DETECTORS.register_module()
class MaskRCNN(TwoStageDetector):
    """Mask R-CNN (reference mmdet/models/detectors/mask_rcnn.py).

    ``forward_train`` additionally expects ``gt_frame_masks``
    (B, G, S, S) from the loader's ``with_mask`` path; ``__call__`` returns
    mask logits for the final detections via ``predict_masks``.
    """

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
        roi_losses = self.roi_head.loss(cls_logits, deltas, labels, targets,
                                        pos, sampled)
        losses.update(roi_losses)

        # mask branch on positive rois (reference: mask loss on sampled
        # positives only; we run all slots and mask the loss)
        from ...core.assigners import max_iou_assign
        gt_idx = jax.vmap(
            lambda r, g, gv: max_iou_assign(r, g, gv, 0.5, 0.5, 0.5, True)
        )(rois, gt_bboxes, gt_valid)
        mask_logits = self.roi_head.mask_forward(feats, rois, sampled, True)
        losses.update(self.roi_head.mask_loss(
            mask_logits, rois, pos, gt_idx, gt_bboxes, gt_frame_masks,
            labels))
        losses['num_gts'] = jnp.mean(
            jnp.sum(gt_valid.astype(jnp.float32), axis=1))
        return losses

    def predict_masks(self, img, det_bboxes, det_valid):
        """Mask probabilities for given detections:
        (B, D, 28, 28, num_classes) sigmoid outputs."""
        feats = self.extract_feat(img, train=False)
        logits = self.roi_head.mask_forward(feats, det_bboxes, det_valid,
                                            False)
        return jax.nn.sigmoid(logits)