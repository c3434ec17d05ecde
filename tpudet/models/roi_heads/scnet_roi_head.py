"""SCNet (reference mmdet/models/roi_heads/scnet_roi_head.py,
bbox_heads/scnet_bbox_head.py, mask_heads/{scnet_mask_head,
scnet_semantic_head, global_context_head, feature_relay_head}.py,
detectors/scnet.py; config configs/scnet/scnet_r50_fpn_1x_coco.py).

Sample-consistent cascade: Cascade R-CNN plus three cross-task couplings
- a fused semantic branch whose stride-8 embedding is RoI-added into both
  bbox (7x7) and mask (14x14) features (loss weight 0.2);
- a global-context branch: 4 convs on the last pyramid level -> GAP ->
  multi-label class BCE (weight 3.0); the pooled feature vector is added
  per image to every RoI feature (global_context_head.py:70-100);
- feature relay: the last cascade stage's shared FC feature is projected
  back to a 7x7x256 map, 2x-bilinear-upsampled and added into the mask
  features (feature_relay_head.py:41-52);
- one mask head (residual-block FCN) run once after the cascade, loss
  scaled by sum(stage_loss_weights) (scnet_roi_head.py:303-315).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.mask import mask_targets_from_gt_frame
from ...ops.roi_align import roi_align
from ...registry import DETECTORS, HEADS
from .. import losses as L
from .cascade_roi_head import (STAGE_WEIGHTS, CascadeRCNN, CascadeRoIHead)
from .htc_roi_head import FusedSemanticHead


class SCNetBBoxHead(nn.Module):
    """Shared2FC head that also returns the shared FC feature
    (scnet_bbox_head.py:58-76)."""
    num_classes: int
    in_channels: int = 256
    fc_out_channels: int = 1024
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_feats, train: bool = False):
        lead = roi_feats.shape[:-3]
        x = roi_feats.reshape(lead + (-1,))
        for i in range(2):
            x = jax.nn.relu(
                nn.Dense(self.fc_out_channels, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name=f'shared_fc{i}')(x))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       name='fc_cls')(x)
        reg = nn.Dense(4, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.001),
                       name='fc_reg')(x)
        return cls, reg, x


class GlobalContextHead(nn.Module):
    """4 convs on the last level -> GAP -> multi-label fc
    (global_context_head.py)."""
    num_classes: int
    in_channels: int = 256
    conv_out_channels: int = 256
    num_convs: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[-1]
        for i in range(self.num_convs):
            x = jax.nn.relu(
                nn.Conv(self.conv_out_channels, (3, 3), padding='SAME',
                        use_bias=True, dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=f'conv{i}')(x))
        pooled = jnp.mean(x, axis=(1, 2))  # (B, C)
        mc_pred = nn.Dense(self.num_classes, dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='fc')(pooled)
        return mc_pred.astype(jnp.float32), pooled


class SCNetMaskHead(nn.Module):
    """Residual-block FCN mask head (scnet_mask_head.py conv_to_res):
    num_convs//2 SimplifiedBasicBlocks, then 2x deconv + logits."""
    num_classes: int
    in_channels: int = 256
    conv_out_channels: int = 256
    num_res_blocks: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_res_blocks):
            identity = x
            y = jax.nn.relu(
                nn.Conv(self.conv_out_channels, (3, 3), padding='SAME',
                        use_bias=True, dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=f'res{i}_conv1')(x))
            y = nn.Conv(self.conv_out_channels, (3, 3), padding='SAME',
                        use_bias=True, dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=f'res{i}_conv2')(y)
            if identity.shape[-1] != self.conv_out_channels:
                identity = nn.Conv(self.conv_out_channels, (1, 1),
                                   use_bias=False, dtype=self.dtype,
                                   kernel_init=nn.initializers.he_normal(),
                                   name=f'res{i}_proj')(identity)
            x = jax.nn.relu(identity + y)
        x = jax.nn.relu(
            nn.ConvTranspose(self.conv_out_channels, (2, 2), (2, 2),
                             dtype=self.dtype,
                             kernel_init=nn.initializers.he_normal(),
                             name='upsample')(x))
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.001),
                       name='conv_logits')(x)


@HEADS.register_module()
class SCNetRoIHead(CascadeRoIHead):
    mask_size: int = 28
    num_semantic_classes: int = 183
    semantic_stride: int = 8
    semantic_loss_weight: float = 0.2
    glbctx_loss_weight: float = 3.0
    fc_out_channels: int = 1024

    def setup(self):
        self.bbox_heads = [
            SCNetBBoxHead(num_classes=self.num_classes,
                          in_channels=self.in_channels,
                          fc_out_channels=self.fc_out_channels,
                          dtype=self.dtype, name=f'bbox_head{i}')
            for i in range(self.num_stages)
        ]
        self.mask_head = SCNetMaskHead(num_classes=self.num_classes,
                                       in_channels=self.in_channels,
                                       dtype=self.dtype)
        self.semantic_head = FusedSemanticHead(
            num_classes=self.num_semantic_classes,
            in_channels=self.in_channels,
            conv_out_channels=self.in_channels, dtype=self.dtype)
        self.glbctx_head = GlobalContextHead(
            num_classes=self.num_classes, in_channels=self.in_channels,
            conv_out_channels=self.in_channels, dtype=self.dtype)
        # feature relay: shared fc feature -> 7x7x256 map
        self.feat_relay_fc = nn.Dense(
            self.in_channels * self.roi_size * self.roi_size,
            dtype=self.dtype, kernel_init=nn.initializers.he_normal(),
            name='feat_relay_fc')

    def semantic_roi_feats(self, sem_embedding, rois, roi_valid, size):
        def one(emb, r, v):
            return roi_align(emb, r / self.semantic_stride, size)
        return jax.vmap(one)(sem_embedding, rois, roi_valid)

    def run_stage(self, stage, feats, rois, roi_valid, train: bool = False,
                  sem_embedding=None, glbctx_feat=None):
        """Pool + semantic-add + glbctx-add -> stage bbox head; returns
        (cls, deltas, shared_fc_feat)."""
        pooled = self.extract(feats, rois, roi_valid)  # (B,P,7,7,C)
        if sem_embedding is not None:
            sem = self.semantic_roi_feats(sem_embedding, rois, roi_valid,
                                          self.roi_size)
            pooled = pooled + sem
        if glbctx_feat is not None:
            pooled = pooled + glbctx_feat[:, None, None, None, :]
        return self.bbox_heads[stage](pooled, train)

    def mask_forward(self, feats, rois, roi_valid, sem_embedding,
                     glbctx_feat, relayed, train: bool = False):
        pooled = self.extract(feats, rois, roi_valid, out_size=14)
        b, p = pooled.shape[:2]
        x = pooled
        if sem_embedding is not None:
            x = x + self.semantic_roi_feats(sem_embedding, rois, roi_valid,
                                            14)
        if glbctx_feat is not None:
            x = x + glbctx_feat[:, None, None, None, :]
        if relayed is not None:
            r = self.feat_relay_fc(relayed)  # (B, P, 7*7*C)
            r = r.reshape(b, p, self.roi_size, self.roi_size,
                          self.in_channels)
            r = jax.image.resize(r, (b, p, 14, 14, self.in_channels),
                                 'bilinear')
            x = x + r
        flat = x.reshape((b * p,) + x.shape[2:])
        logits = self.mask_head(flat, train)
        return logits.reshape((b, p) + logits.shape[1:])

    def semantic_loss(self, seg_logits, gt_semantic_seg) -> Dict:
        tgt = jax.nn.one_hot(gt_semantic_seg, self.num_semantic_classes)
        logp = jax.nn.log_softmax(seg_logits, axis=-1)
        return dict(loss_semantic_seg=self.semantic_loss_weight *
                    -jnp.mean(jnp.sum(tgt * logp, -1)))

    def glbctx_loss(self, mc_pred, gt_labels, gt_valid) -> Dict:
        onehot = jax.nn.one_hot(gt_labels, self.num_classes)
        tgt = jnp.max(onehot * gt_valid[..., None], axis=1)  # (B, C)
        bce = L.binary_cross_entropy_with_logits(mc_pred, tgt)
        return dict(loss_glbctx=self.glbctx_loss_weight * jnp.mean(bce))

    def mask_loss(self, mask_logits, rois, pos, gt_idx, gt_boxes,
                  gt_frame_masks, labels, weight: float = 1.0) -> Dict:
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
                per_roi.astype(jnp.float32), jnp.clip(targets, 0., 1.))
            return jnp.sum(bce * pos_i[:, None, None]), jnp.sum(pos_i)

        sums, counts = jax.vmap(one)(
            mask_logits, rois, pos.astype(jnp.float32),
            jnp.clip(gt_idx, 0, None), gt_boxes, gt_frame_masks, labels)
        denom = jnp.maximum(jnp.sum(counts), 1.0) * self.mask_size**2
        return dict(loss_mask=weight * jnp.sum(sums) / denom)


@DETECTORS.register_module()
class SCNet(CascadeRCNN):
    """SCNet detector (reference detectors/scnet.py). ``forward_train``
    takes ``gt_frame_masks`` and optionally ``gt_semantic_seg``."""

    def _context(self, feats, train):
        sem_embedding, seg_logits = self.roi_head.semantic_head(feats,
                                                                train)
        mc_pred, glbctx_feat = self.roi_head.glbctx_head(feats, train)
        return sem_embedding, seg_logits, mc_pred, glbctx_feat

    def __call__(self, img, train: bool = False):
        feats = self.extract_feat(img, train)
        sem_embedding, _, _, glbctx_feat = self._context(feats, train)
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
            cls_logits, deltas, _ = self.roi_head.run_stage(
                stage, feats, rois, roi_valid, train,
                sem_embedding=sem_embedding, glbctx_feat=glbctx_feat)
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
        sem_embedding, seg_logits, mc_pred, glbctx_feat = self._context(
            feats, True)
        rpn_preds = self.rpn_head(feats, train=True)
        losses = self.rpn_head.loss(rpn_preds, gt_bboxes, gt_labels,
                                    gt_valid)
        if gt_semantic_seg is not None:
            losses.update(self.roi_head.semantic_loss(seg_logits,
                                                      gt_semantic_seg))
        losses.update(self.roi_head.glbctx_loss(mc_pred, gt_labels,
                                                gt_valid))

        cfg = dict(self.train_cfg or {}).get('rpn_proposal', {})
        proposals, _, prop_valid = self.rpn_head.get_proposals(
            rpn_preds, img_shape=img.shape[1:3],
            nms_pre=cfg.get('nms_pre', 2000),
            max_num=cfg.get('max_per_img', 1000),
            iou_thr=cfg.get('nms', {}).get('iou_threshold', 0.7))
        proposals = jax.lax.stop_gradient(proposals)

        rois, sampled0, labels, targets, pos = self.roi_head.sample_rois(
            proposals, prop_valid, gt_bboxes, gt_labels, gt_valid)
        roi_valid = sampled0
        relayed = None
        for stage in range(self.roi_head.num_stages):
            cls_logits, deltas, shared = self.roi_head.run_stage(
                stage, feats, rois, roi_valid, True,
                sem_embedding=sem_embedding, glbctx_feat=glbctx_feat)
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
            relayed = shared  # last stage's shared fc feature
            last_pos = st_pos
            if stage < self.roi_head.num_stages - 1:
                rois = jax.lax.stop_gradient(
                    self.roi_head.refine(stage, rois,
                                         deltas.astype(jnp.float32),
                                         img.shape[1:3]))

        # single mask pass after the cascade, fed by the relayed feature
        from ...core.assigners import max_iou_assign
        gt_idx = jax.vmap(
            lambda r, g, gv: max_iou_assign(r, g, gv, 0.5, 0.5, 0.5, True)
        )(rois, gt_bboxes, gt_valid)
        m_labels = jnp.where(
            last_pos, jnp.take_along_axis(
                gt_labels, jnp.clip(gt_idx, 0, None), axis=1),
            self.roi_head.num_classes)
        mask_logits = self.roi_head.mask_forward(
            feats, rois, roi_valid, sem_embedding, glbctx_feat, relayed,
            True)
        losses.update(self.roi_head.mask_loss(
            mask_logits, rois, last_pos, gt_idx, gt_bboxes, gt_frame_masks,
            m_labels, weight=float(sum(STAGE_WEIGHTS))))
        losses['num_gts'] = jnp.mean(
            jnp.sum(gt_valid.astype(jnp.float32), axis=1))
        return losses

    def predict_masks(self, img, det_bboxes, det_valid):
        """Mask probabilities for final detections (relay included):
        (B, D, 28, 28, C) sigmoid outputs."""
        feats = self.extract_feat(img, train=False)
        sem_embedding, _, _, glbctx_feat = self._context(feats, False)
        _, _, shared = self.roi_head.run_stage(
            self.roi_head.num_stages - 1, feats, det_bboxes, det_valid,
            False, sem_embedding=sem_embedding, glbctx_feat=glbctx_feat)
        logits = self.roi_head.mask_forward(
            feats, det_bboxes, det_valid, sem_embedding, glbctx_feat,
            shared, False)
        return jax.nn.sigmoid(logits)
