"""Hybrid Task Cascade (reference mmdet/models/roi_heads/htc_roi_head.py +
mask_heads/fused_semantic_head.py + htc_mask_head.py,
detectors/htc.py).

On top of the cascade bbox stages:
- a per-stage mask head with MASK INFORMATION FLOW: stage i's mask
  features receive the previous stage's (1x1-conv-transformed) mask
  features (htc_roi_head._mask_forward_train);
- a SEMANTIC branch fused from all FPN levels at stride 8
  (FusedSemanticHead): per-level lateral convs summed at level 1, 4 convs,
  a seg-logits conv (CE loss) and an embedding conv whose RoI-aligned
  crops are added to both bbox and mask RoI features;
- interleaved execution: each stage's mask runs on that stage's
  (refined) boxes.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.assigners import max_iou_assign
from ...core.mask import mask_targets_from_gt_frame
from ...ops.roi_align import multilevel_roi_align, roi_align
from ...registry import DETECTORS, HEADS
from .. import losses as L
from ..detectors.two_stage import TwoStageDetector
from .cascade_roi_head import (STAGE_WEIGHTS, CascadeRCNN, CascadeRoIHead)
from .mask_head import FCNMaskHead


class FusedSemanticHead(nn.Module):
    """reference fused_semantic_head.py: lateral 1x1 per level -> fuse at
    ``fusion_level`` -> 4 convs -> (embedding feats, seg logits)."""
    num_classes: int = 183
    in_channels: int = 256
    conv_out_channels: int = 256
    fusion_level: int = 1
    num_convs: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        target_hw = feats[self.fusion_level].shape[1:3]
        fused = 0.
        for i, f in enumerate(feats):
            v = nn.Conv(self.in_channels, (1, 1), use_bias=True,
                        dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=f'lateral{i}')(f)
            if f.shape[1] != target_hw[0]:
                v = jax.image.resize(
                    v, (v.shape[0],) + tuple(target_hw) + (v.shape[-1],),
                    method='bilinear')
            fused = fused + v
        x = fused
        for i in range(self.num_convs):
            x = jax.nn.relu(
                nn.Conv(self.conv_out_channels, (3, 3), padding='SAME',
                        use_bias=True, dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=f'conv{i}')(x))
        embedding = jax.nn.relu(
            nn.Conv(self.conv_out_channels, (1, 1), use_bias=True,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.he_normal(),
                    name='conv_embedding')(x))
        logits = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                         dtype=self.dtype,
                         kernel_init=nn.initializers.normal(0.01),
                         name='conv_logits')(x)
        return embedding, logits.astype(jnp.float32)


@HEADS.register_module()
class HTCRoIHead(CascadeRoIHead):
    mask_size: int = 28
    semantic_fusion: bool = True
    num_semantic_classes: int = 183
    semantic_stride: int = 8

    def setup(self):
        super().setup()
        self.mask_heads = [
            FCNMaskHead(num_classes=self.num_classes,
                        in_channels=self.in_channels, dtype=self.dtype,
                        name=f'mask_head{i}')
            for i in range(self.num_stages)
        ]
        # mask info flow 1x1 convs (stage 1..)
        self.mask_info_convs = [
            nn.Conv(self.in_channels, (1, 1), use_bias=True,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.he_normal(),
                    name=f'mask_info{i}')
            for i in range(self.num_stages - 1)
        ]
        if self.semantic_fusion:
            self.semantic_head = FusedSemanticHead(
                num_classes=self.num_semantic_classes,
                in_channels=self.in_channels,
                conv_out_channels=self.in_channels, dtype=self.dtype)

    def semantic_roi_feats(self, sem_embedding, rois, roi_valid, size):
        """RoI-align crops of the semantic embedding (stride 8)."""

        def one(emb, r, v):
            return roi_align(emb, r / self.semantic_stride, size)

        return jax.vmap(one)(sem_embedding, rois, roi_valid)

    def run_stage(self, stage, feats, rois, roi_valid, train: bool = False,
                  sem_embedding=None):
        """Cascade bbox stage + semantic fusion (reference
        htc_roi_head._bbox_forward adds the semantic crop to the bbox
        features as well as the mask features)."""
        pooled = self.extract(feats, rois, roi_valid)
        if sem_embedding is not None:
            pooled = pooled + self.semantic_roi_feats(
                sem_embedding, rois, roi_valid, self.roi_size)
        return self.bbox_heads[stage](pooled, train)

    def mask_stage(self, stage, feats, rois, roi_valid, sem_embedding,
                   prev_mask_feat, train: bool = False):
        """Returns (mask_logits (B,P,28,28,C), this stage's 14x14 feats)."""
        pooled = self.extract(feats, rois, roi_valid, out_size=14)
        b, p = pooled.shape[:2]
        x = pooled.reshape((b * p,) + pooled.shape[2:])
        if sem_embedding is not None:
            sem = self.semantic_roi_feats(sem_embedding, rois, roi_valid, 14)
            x = x + sem.reshape((b * p,) + sem.shape[2:])
        if prev_mask_feat is not None:
            x = x + self.mask_info_convs[stage - 1](prev_mask_feat)
        logits = self.mask_heads[stage](x, train)
        return logits.reshape((b, p) + logits.shape[1:]), x

    def mask_loss(self, stage, mask_logits, rois, pos, gt_idx, gt_boxes,
                  gt_frame_masks, labels):
        def one(logits_i, rois_i, pos_i, gt_idx_i, gt_boxes_i, gfm_i,
                labels_i):
            matched_masks = gfm_i[gt_idx_i]
            matched_boxes = gt_boxes_i[gt_idx_i]
            targets = mask_targets_from_gt_frame(
                matched_masks, matched_boxes, rois_i, self.mask_size)
            cls_idx = jnp.clip(labels_i, 0, self.num_classes - 1)
            per_roi = jnp.take_along_axis(
                logits_i, cls_idx[:, None, None, None], axis=-1)[..., 0]
            bce = L.binary_cross_entropy_with_logits(
                per_roi, jnp.clip(targets, 0., 1.))
            return jnp.sum(bce * pos_i[:, None, None]), jnp.sum(pos_i)

        sums, counts = jax.vmap(one)(
            mask_logits, rois, pos.astype(jnp.float32),
            jnp.clip(gt_idx, 0, None), gt_boxes, gt_frame_masks, labels)
        denom = jnp.maximum(jnp.sum(counts), 1.0) * self.mask_size**2
        return jnp.sum(sums) / denom


@DETECTORS.register_module()
class HybridTaskCascade(CascadeRCNN):
    """HTC detector (reference mmdet/models/detectors/htc.py).

    ``forward_train`` takes ``gt_frame_masks`` and optionally
    ``gt_semantic_seg`` (B, H/8, W/8) int labels for the semantic CE loss.
    """

    def __call__(self, img, train: bool = False):
        feats = self.extract_feat(img, train)
        sem_embedding = None
        if self.roi_head.semantic_fusion:
            sem_embedding, _ = self.roi_head.semantic_head(feats, train)
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
                stage, feats, rois, roi_valid, train,
                sem_embedding=sem_embedding)
            cls_sum = cls_sum + jax.nn.softmax(
                cls_logits.astype(jnp.float32), axis=-1)
            if stage < self.roi_head.num_stages - 1:
                rois = self.roi_head.refine(stage, rois,
                                            deltas.astype(jnp.float32),
                                            img.shape[1:3])
        avg_scores = cls_sum / self.roi_head.num_stages
        img_hw = jnp.asarray(img.shape[1:3], jnp.float32)
        return rois, roi_valid, avg_scores, deltas, img_hw

    def forward_train(self, img, gt_bboxes, gt_labels, gt_valid,
                      gt_frame_masks, gt_semantic_seg=None):
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

        sem_embedding = None
        if self.roi_head.semantic_fusion:
            sem_embedding, sem_logits = self.roi_head.semantic_head(
                feats, True)
            if gt_semantic_seg is not None:
                logp = jax.nn.log_softmax(sem_logits, -1)
                tgt = jnp.clip(gt_semantic_seg, 0,
                               self.roi_head.num_semantic_classes - 1)
                ce = -jnp.take_along_axis(logp, tgt[..., None],
                                          axis=-1)[..., 0]
                losses['loss_semantic_seg'] = 0.2 * jnp.mean(ce)

        rois, sampled0, labels, targets, pos = self.roi_head.sample_rois(
            proposals, prop_valid, gt_bboxes, gt_labels, gt_valid)
        roi_valid = sampled0
        prev_mask_feat = None
        for stage in range(self.roi_head.num_stages):
            cls_logits, deltas = self.roi_head.run_stage(
                stage, feats, rois, roi_valid, True,
                sem_embedding=sem_embedding)
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

            # interleaved mask stage with info flow
            gt_idx = jax.vmap(
                lambda r, g, gv: max_iou_assign(r, g, gv, 0.5, 0.5, 0.5,
                                                True)
            )(rois, gt_bboxes, gt_valid)
            mask_logits, prev_mask_feat = self.roi_head.mask_stage(
                stage, feats, rois, roi_valid, sem_embedding,
                prev_mask_feat, True)
            losses[f'loss_mask_s{stage}'] = w * self.roi_head.mask_loss(
                stage, mask_logits, rois, st_pos, gt_idx, gt_bboxes,
                gt_frame_masks, st_labels)

            if stage < self.roi_head.num_stages - 1:
                rois = jax.lax.stop_gradient(
                    self.roi_head.refine(stage, rois,
                                         deltas.astype(jnp.float32),
                                         img.shape[1:3]))
        losses['num_gts'] = jnp.mean(
            jnp.sum(gt_valid.astype(jnp.float32), axis=1))
        return losses
