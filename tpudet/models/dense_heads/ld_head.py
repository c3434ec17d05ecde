"""Localization Distillation (reference mmdet/models/dense_heads/ld_head.py
+ detectors/kd_one_stage.py).

LDHead = GFLHead whose discretized box-distribution logits are additionally
distilled from a teacher's logits at positive anchors via
temperature-softened KL divergence (KnowledgeDistillationKLDivLoss, T=10,
weight 0.25), weighted by the positives' quality scores like the DFL term.

The KD detector holds the teacher as a frozen submodule: its outputs are
stop-gradient'ed, so no gradient reaches teacher params (load converted
teacher weights into the ``teacher`` subtree; exclude it from weight decay
when fine-tuning long runs).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import DETECTORS, HEADS
from .. import losses as L
from ..detectors.single_stage import SingleStageDetector
from .gfl_head import GFLHead


@HEADS.register_module()
class LDHead(GFLHead):
    ld_T: float = 10.0
    ld_weight: float = 0.25

    def _pos_quality(self, preds, gt_bboxes, gt_valid):
        """(B, A) KD weights of positives (0 elsewhere): the detached max
        sigmoid cls score, the same weight_targets the reference's DFL and
        LD terms use (ld_head.py loss_single)."""
        import numpy as np
        from ...core.assigners import atss_assign_batch
        cls_scores, _ = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        per_level = self.anchor_generator.grid_anchors(featmap_sizes)
        counts = [len(a) for a in per_level]
        anchors = jnp.asarray(np.concatenate(per_level))
        b = cls_scores[0].shape[0]
        cls_flat = jnp.concatenate([
            c.reshape(b, -1, self.num_classes).astype(jnp.float32)
            for c in cls_scores], axis=1)
        assigned = atss_assign_batch(anchors, counts, gt_bboxes, gt_valid,
                                     self.topk)
        pos = assigned >= 0
        quality = jnp.max(jax.nn.sigmoid(cls_flat), axis=-1)
        return jax.lax.stop_gradient(quality) * pos

    def loss_with_teacher(self, preds, teacher_preds, gt_bboxes, gt_labels,
                          gt_valid) -> Dict:
        losses = self.loss(preds, gt_bboxes, gt_labels, gt_valid)
        _, reg_logits = preds
        _, t_reg_logits = teacher_preds
        b = reg_logits[0].shape[0]
        s_flat = jnp.concatenate([
            r.reshape(b, -1, 4, self.reg_max + 1).astype(jnp.float32)
            for r in (rr.reshape(rr.shape[0], -1, 4 * (self.reg_max + 1))
                      for rr in reg_logits)], axis=1)
        t_flat = jnp.concatenate([
            r.reshape(b, -1, 4, self.reg_max + 1).astype(jnp.float32)
            for r in (rr.reshape(rr.shape[0], -1, 4 * (self.reg_max + 1))
                      for rr in t_reg_logits)], axis=1)
        t_flat = jax.lax.stop_gradient(t_flat)

        # positive weighting identical to the DFL term: quality scores
        pos_w = self._pos_quality(preds, gt_bboxes, gt_valid)
        kd = L.kd_kl_div_loss(s_flat, t_flat, T=self.ld_T,
                              reduction='none')  # (B, A, 4)
        kd = jnp.mean(kd, axis=-1)
        # unlike bbox/dfl, the reference does NOT renormalize loss_ld by
        # the quality-weight sum: per level it is sum(kd_row * w) / 4.0
        # over corner rows = sum over positives of w * mean-corner kd
        # (ld_head.py loss_single avg_factor=4.0; loss():253-256 divides
        # only losses_bbox/losses_dfl by the global avg_factor)
        losses['loss_ld'] = self.ld_weight * jnp.sum(kd * pos_w)
        return losses


@DETECTORS.register_module()
class KnowledgeDistillationSingleStageDetector(SingleStageDetector):
    """Student + frozen teacher (reference kd_one_stage.py)."""
    teacher_backbone: Optional[nn.Module] = None
    teacher_neck: Optional[nn.Module] = None
    teacher_bbox_head: Optional[nn.Module] = None

    def teacher_forward(self, img):
        x = self.teacher_backbone(img, False)
        if self.teacher_neck is not None:
            x = self.teacher_neck(x, False)
        preds = self.teacher_bbox_head(x, False)
        return jax.tree.map(jax.lax.stop_gradient, preds)

    def forward_train(self, img, gt_bboxes, gt_labels, gt_valid):
        feats = self.extract_feat(img, train=True)
        preds = self.bbox_head(feats, True)
        teacher_preds = self.teacher_forward(img)
        return self.bbox_head.loss_with_teacher(
            preds, teacher_preds, gt_bboxes, gt_labels, gt_valid)
