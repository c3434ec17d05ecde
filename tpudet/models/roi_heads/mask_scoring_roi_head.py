"""Mask Scoring R-CNN (reference mmdet/models/roi_heads/
mask_scoring_roi_head.py + mask_heads/maskiou_head.py).

A MaskIoU head regresses the IoU between the predicted and gt mask from
the 14x14 RoI features concatenated with the (max-pooled) mask prediction;
at test time the detection score is multiplied by the predicted mask IoU
of the detected class.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.mask import mask_targets_from_gt_frame
from ...registry import DETECTORS, HEADS
from .mask_head import MaskRCNN, MaskRoIHead


class MaskIoUHead(nn.Module):
    """maskiou_head.py: 4 convs (last stride 2) over [roi_feat; mask_pred]
    -> 3 fcs -> per-class IoU."""
    num_classes: int
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_feats, mask_pred):
        """roi_feats (N, 14, 14, C); mask_pred (N, 28, 28) of the detected
        class (sigmoid probs)."""
        # max-pool mask pred to 14x14 and concat as an extra channel
        mp = nn.max_pool(mask_pred[..., None], (2, 2), strides=(2, 2))
        x = jnp.concatenate([roi_feats, mp], axis=-1)
        for i in range(4):
            stride = 2 if i == 3 else 1
            x = jax.nn.relu(
                nn.Conv(self.conv_out_channels, (3, 3), (stride, stride),
                        padding='SAME', dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=f'conv{i}')(x))
        x = x.reshape(x.shape[0], -1)
        for i in range(3):
            x = jax.nn.relu(
                nn.Dense(self.fc_out_channels, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name=f'fc{i}')(x))
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.01),
                        name='fc_mask_iou')(x).astype(jnp.float32)


@HEADS.register_module()
class MaskScoringRoIHead(MaskRoIHead):

    def setup(self):
        super().setup()
        self.mask_iou_head = MaskIoUHead(num_classes=self.num_classes,
                                         dtype=self.dtype)

    def mask_iou_forward(self, feats, rois, roi_valid, mask_logits, labels,
                         train: bool = False):
        """Returns predicted mask IoU for each roi at its label's class."""
        pooled = self.extract(feats, rois, roi_valid)
        b, p = pooled.shape[:2]
        x = pooled.reshape((b * p,) + pooled.shape[2:])
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # 14x14
        cls_idx = jnp.clip(labels, 0, self.num_classes - 1).reshape(-1)
        mp = jax.nn.sigmoid(mask_logits.reshape(
            (b * p,) + mask_logits.shape[2:]))
        mp = jnp.take_along_axis(mp, cls_idx[:, None, None, None],
                                 axis=-1)[..., 0]
        ious = self.mask_iou_head(x, mp)  # (B*P, C)
        ious = jnp.take_along_axis(ious, cls_idx[:, None], axis=1)[:, 0]
        return ious.reshape(b, p)

    def mask_iou_loss(self, pred_ious, mask_logits, rois, pos, gt_idx,
                      gt_boxes, gt_frame_masks, labels) -> Dict:
        """L2 between predicted IoU and the actual (binarized pred vs gt
        target) mask IoU on positives (maskiou_head loss, weight 0.5)."""
        b, p = rois.shape[:2]

        def one(logits_i, rois_i, gt_idx_i, gt_boxes_i, gfm_i, labels_i):
            matched_masks = gfm_i[gt_idx_i]
            matched_boxes = gt_boxes_i[gt_idx_i]
            targets = mask_targets_from_gt_frame(
                matched_masks, matched_boxes, rois_i, self.mask_size)
            cls_idx = jnp.clip(labels_i, 0, self.num_classes - 1)
            per_roi = jnp.take_along_axis(
                logits_i, cls_idx[:, None, None, None], axis=-1)[..., 0]
            pm = (jax.nn.sigmoid(per_roi) > 0.5).astype(jnp.float32)
            tm = (targets > 0.5).astype(jnp.float32)
            inter = jnp.sum(pm * tm, axis=(1, 2))
            union = jnp.sum(jnp.maximum(pm, tm), axis=(1, 2))
            return inter / jnp.maximum(union, 1.0)

        true_iou = jax.vmap(one)(mask_logits, rois,
                                 jnp.clip(gt_idx, 0, None), gt_boxes,
                                 gt_frame_masks, labels)
        w = pos.astype(jnp.float32)
        num = jnp.maximum(jnp.sum(w), 1.0)
        loss = 0.5 * jnp.sum((pred_ious - jax.lax.stop_gradient(true_iou))**2
                             * w) / num
        return dict(loss_mask_iou=loss)


@DETECTORS.register_module()
class MaskScoringRCNN(MaskRCNN):
    """reference mmdet/models/detectors/mask_scoring_rcnn.py."""

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
                                         targets, pos, sampled))

        from ...core.assigners import max_iou_assign
        gt_idx = jax.vmap(
            lambda r, g, gv: max_iou_assign(r, g, gv, 0.5, 0.5, 0.5, True)
        )(rois, gt_bboxes, gt_valid)
        mask_logits = self.roi_head.mask_forward(feats, rois, sampled, True)
        losses.update(self.roi_head.mask_loss(
            mask_logits, rois, pos, gt_idx, gt_bboxes, gt_frame_masks,
            labels))
        pred_ious = self.roi_head.mask_iou_forward(
            feats, rois, sampled, mask_logits, labels, True)
        losses.update(self.roi_head.mask_iou_loss(
            pred_ious, mask_logits, rois, pos, gt_idx, gt_bboxes,
            gt_frame_masks, labels))
        losses['num_gts'] = jnp.mean(
            jnp.sum(gt_valid.astype(jnp.float32), axis=1))
        return losses
