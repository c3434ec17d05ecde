"""Sparse R-CNN (reference mmdet/models/roi_heads/sparse_roi_head.py,
bbox_heads/dii_head.py, dense_heads/embedding_rpn_head.py,
utils/transformer.py::DynamicConv, detectors/sparse_rcnn.py).

Set prediction with 100 learned proposal boxes + features refined by 6
Dynamic Instance Interactive heads:
- EmbeddingRPN: learned normalized cxcywh boxes scaled to the image, plus
  learned per-proposal features;
- DIIHead: self-attention over proposals, dynamic 1x1 interaction with the
  7x7 RoI features (two bmm's with per-proposal generated params), FFN,
  then cls (sigmoid focal) and iterative delta regression
  (DeltaXYWH stds (0.5, 0.5, 1, 1), clip_border=False);
- per-stage Hungarian matching with focal/L1(normalized)/GIoU costs
  (2/5/2) and the same-weighted losses, every stage weighted 1.0.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.assigners import hungarian_assign
from ...core.bbox import DeltaXYWHBBoxCoder, bbox_overlaps, \
    bbox_overlaps_aligned
from ...core.nms import NMSResult
from ...ops.roi_align import multilevel_roi_align
from ...registry import DETECTORS, HEADS
from .. import losses as L

EPS = 1e-8


@HEADS.register_module()
class EmbeddingRPNHead(nn.Module):
    """Learned proposals (embedding_rpn_head.py:10-93)."""
    num_proposals: int = 100
    proposal_feature_channel: int = 256

    @nn.compact
    def __call__(self, img_hw, batch: int):
        # reference init: centers 0.5, sizes 1.0 -> whole-image proposals
        boxes_n = self.param(
            'init_proposal_bboxes',
            lambda key, shape: jnp.concatenate(
                [jnp.full(shape[:-1] + (2,), 0.5),
                 jnp.full(shape[:-1] + (2,), 1.0)], -1),
            (self.num_proposals, 4))  # normalized cxcywh
        feats = self.param('init_proposal_features',
                           nn.initializers.normal(1.0),
                           (self.num_proposals,
                            self.proposal_feature_channel))
        h, w = img_hw
        whwh = jnp.asarray([w, h, w, h], jnp.float32)
        cx, cy, bw, bh = (boxes_n[:, 0], boxes_n[:, 1], boxes_n[:, 2],
                          boxes_n[:, 3])
        xyxy = jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2,
                          cy + bh / 2], -1) * whwh
        proposals = jnp.broadcast_to(xyxy[None],
                                     (batch,) + xyxy.shape)
        pfeats = jnp.broadcast_to(feats[None], (batch,) + feats.shape)
        return proposals, pfeats


class DynamicConv(nn.Module):
    """transformer.py:684-784: per-proposal generated 1x1 params applied
    as two matmuls over the flattened RoI feature."""
    in_channels: int = 256
    feat_channels: int = 64
    input_feat_size: int = 7
    dtype: Any = None

    @nn.compact
    def __call__(self, param_feat, roi_feat):
        """param_feat (N, C); roi_feat (N, S, S, C) -> (N, C)."""
        n = param_feat.shape[0]
        cin, cf = self.in_channels, self.feat_channels
        params = nn.Dense(cin * cf * 2, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          name='dynamic_layer')(param_feat)
        p_in = params[:, :cin * cf].reshape(n, cin, cf)
        p_out = params[:, cin * cf:].reshape(n, cf, cin)
        x = roi_feat.reshape(n, -1, cin)  # (N, S*S, C)
        x = jnp.einsum('npc,ncf->npf', x, p_in)
        x = jax.nn.relu(nn.LayerNorm(dtype=self.dtype, name='norm_in')(x))
        x = jnp.einsum('npf,nfc->npc', x, p_out)
        x = jax.nn.relu(nn.LayerNorm(dtype=self.dtype, name='norm_out')(x))
        x = x.reshape(n, -1)
        x = nn.Dense(self.in_channels, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(),
                     name='fc_layer')(x)
        return jax.nn.relu(nn.LayerNorm(dtype=self.dtype,
                                        name='fc_norm')(x))


class DIIHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    num_cls_fcs: int = 1
    num_reg_fcs: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_feats, proposal_feats):
        """roi_feats (B, P, S, S, C); proposal_feats (B, P, C)."""
        b, p = proposal_feats.shape[:2]
        x = proposal_feats
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.in_channels,
            dtype=self.dtype, name='self_attn')(x, x, x)
        x = nn.LayerNorm(dtype=self.dtype, name='attn_norm')(x + attn)

        flat = x.reshape(b * p, -1)
        roi_flat = roi_feats.reshape((b * p,) + roi_feats.shape[2:])
        inter = DynamicConv(self.in_channels, dtype=self.dtype,
                            name='instance_interactive_conv')(flat, roi_flat)
        x = nn.LayerNorm(dtype=self.dtype, name='inter_norm')(
            (flat + inter).reshape(b, p, -1))

        ffn = nn.Dense(self.ffn_dim, dtype=self.dtype, name='ffn_fc1')(x)
        ffn = nn.Dense(self.in_channels, dtype=self.dtype,
                       name='ffn_fc2')(jax.nn.relu(ffn))
        obj = nn.LayerNorm(dtype=self.dtype, name='ffn_norm')(x + ffn)

        c = obj
        for i in range(self.num_cls_fcs):
            c = nn.Dense(self.in_channels, use_bias=False, dtype=self.dtype,
                         name=f'cls_fc{i}')(c)
            c = jax.nn.relu(nn.LayerNorm(dtype=self.dtype,
                                         name=f'cls_ln{i}')(c))
        import math
        cls_logits = nn.Dense(
            self.num_classes, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(
                -math.log((1 - 0.01) / 0.01)), name='fc_cls')(c)

        r = obj
        for i in range(self.num_reg_fcs):
            r = nn.Dense(self.in_channels, use_bias=False, dtype=self.dtype,
                         name=f'reg_fc{i}')(r)
            r = jax.nn.relu(nn.LayerNorm(dtype=self.dtype,
                                         name=f'reg_ln{i}')(r))
        deltas = nn.Dense(4, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.001),
                          name='fc_reg')(r)
        return (cls_logits.astype(jnp.float32), deltas.astype(jnp.float32),
                obj)


@HEADS.register_module()
class SparseRoIHead(nn.Module):
    num_classes: int
    num_stages: int = 6
    in_channels: int = 256
    featmap_strides: Tuple[int, ...] = (4, 8, 16, 32)
    roi_size: int = 7
    # matcher/loss weights (reference sparse_rcnn config)
    cost_cls: float = 2.0
    cost_bbox: float = 5.0
    cost_iou: float = 2.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    dtype: Any = None

    def setup(self):
        self.heads = [
            DIIHead(num_classes=self.num_classes,
                    in_channels=self.in_channels, dtype=self.dtype,
                    name=f'dii{i}') for i in range(self.num_stages)
        ]

    @property
    def bbox_coder(self):
        return DeltaXYWHBBoxCoder(target_stds=(0.5, 0.5, 1.0, 1.0),
                                  clip_border=False)

    def extract(self, feats, rois):
        def one(img_feats, r):
            return multilevel_roi_align(
                img_feats, r, jnp.ones(r.shape[0], bool), self.roi_size,
                self.featmap_strides)
        return jax.vmap(one)(feats, rois)

    def run(self, feats, proposals, proposal_feats):
        """All stages; returns per-stage (cls, boxes) and final feats."""
        boxes = proposals
        pf = proposal_feats
        outs = []
        for i in range(self.num_stages):
            pooled = self.extract(feats, boxes)
            cls_logits, deltas, pf = self.heads[i](pooled, pf)
            boxes = self.bbox_coder.decode(jax.lax.stop_gradient(boxes),
                                           deltas)
            outs.append((cls_logits, boxes))
        return outs

    def stage_loss(self, cls_logits, boxes, gt_bboxes, gt_labels, gt_valid,
                   img_whwh):
        """Hungarian-matched focal + L1(normalized) + GIoU."""
        C = self.num_classes

        def match_one(cl, bx, gts, labels, valid):
            prob = jax.nn.sigmoid(cl)  # (P, C)
            safe = jnp.clip(labels, 0, C - 1)
            pc = prob[:, safe]  # (P, G)
            a, g = self.focal_alpha, self.focal_gamma
            pos_cost = -jnp.log(pc + EPS) * a * (1 - pc)**g
            neg_cost = -jnp.log(1 - pc + EPS) * (1 - a) * pc**g
            cls_cost = pos_cost - neg_cost
            bn = bx / img_whwh
            gn = gts / img_whwh
            bbox_cost = jnp.sum(jnp.abs(bn[:, None] - gn[None]), -1)
            giou = bbox_overlaps(bx, gts, mode='giou')
            cost = (self.cost_cls * cls_cost + self.cost_bbox * bbox_cost -
                    self.cost_iou * giou)
            cost = jnp.where(valid[None, :], cost, 1e8)
            return hungarian_assign(cost, valid)

        assigned = jax.vmap(match_one)(cls_logits, boxes, gt_bboxes,
                                       gt_labels, gt_valid)
        pos = assigned >= 0
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        gt_idx = jnp.clip(assigned, 0, None)
        lab = jnp.take_along_axis(gt_labels, gt_idx, axis=1)
        onehot = jax.nn.one_hot(lab, C) * pos[..., None]
        loss_cls = L.sigmoid_focal_loss(
            cls_logits, onehot, gamma=self.focal_gamma,
            alpha=self.focal_alpha, avg_factor=num_pos, loss_weight=2.0)
        tgt = jnp.take_along_axis(gt_bboxes, gt_idx[..., None], axis=1)
        tgt = jnp.where(pos[..., None], tgt, boxes)
        loss_bbox = L.l1_loss(boxes / img_whwh, tgt / img_whwh,
                              weight=pos[..., None].astype(jnp.float32),
                              avg_factor=num_pos, loss_weight=5.0)
        giou = bbox_overlaps_aligned(boxes, tgt, mode='giou')
        loss_iou = 2.0 * jnp.sum((1 - giou) * pos) / num_pos
        return loss_cls, loss_bbox, loss_iou


@DETECTORS.register_module()
class SparseRCNN(nn.Module):
    backbone: nn.Module
    rpn_head: nn.Module  # EmbeddingRPNHead
    roi_head: nn.Module  # SparseRoIHead
    neck: Any = None
    train_cfg: Any = None
    test_cfg: Any = None

    def extract_feat(self, img, train: bool = False):
        x = self.backbone(img, train=train)
        if self.neck is not None:
            x = self.neck(x, train)
        return x

    def __call__(self, img, train: bool = False):
        feats = self.extract_feat(img, train)
        b = img.shape[0]
        proposals, pfeats = self.rpn_head(img.shape[1:3], b)
        outs = self.roi_head.run(feats, proposals, pfeats)
        return outs[-1]  # (cls_logits, boxes) of the last stage

    def forward_train(self, img, gt_bboxes, gt_labels, gt_valid):
        feats = self.extract_feat(img, train=True)
        b = img.shape[0]
        h, w = img.shape[1:3]
        whwh = jnp.asarray([w, h, w, h], jnp.float32)
        proposals, pfeats = self.rpn_head(img.shape[1:3], b)
        outs = self.roi_head.run(feats, proposals, pfeats)
        losses = {}
        for i, (cl, bx) in enumerate(outs):
            lc, lb, li = self.roi_head.stage_loss(
                cl, bx, gt_bboxes, gt_labels, gt_valid, whwh)
            tag = '' if i == len(outs) - 1 else f's{i}.'
            losses[f'{tag}loss_cls'] = lc
            losses[f'{tag}loss_bbox'] = lb
            losses[f'{tag}loss_iou'] = li
        losses['num_gts'] = jnp.mean(
            jnp.sum(gt_valid.astype(jnp.float32), axis=1))
        return losses

    def get_bboxes(self, outputs, scale_factors=None, max_per_img=None,
                   score_thr: float = 0.0, **kwargs):
        """Reference sparse test: top max_per_img (proposal, class) pairs,
        no NMS."""
        cfg = dict(self.test_cfg or {})
        max_per_img = max_per_img or cfg.get('max_per_img', 100)
        cls_logits, boxes = outputs
        b, p, C = cls_logits.shape
        prob = jax.nn.sigmoid(cls_logits)
        k = min(max_per_img, p * C)
        scores, idx = jax.lax.top_k(prob.reshape(b, -1), k)
        prop_idx = idx // C
        labels = (idx % C).astype(jnp.int32)
        out_boxes = jnp.take_along_axis(boxes, prop_idx[..., None], axis=1)
        if scale_factors is not None:
            out_boxes = out_boxes / scale_factors[:, None, :]
        return NMSResult(out_boxes, scores, labels, scores > score_thr)
