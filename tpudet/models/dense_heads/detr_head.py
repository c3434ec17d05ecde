"""DETR head (reference mmdet/models/dense_heads/detr_head.py, v2.12).

Set prediction with a 6x6 post-norm transformer over the C5 feature map:
1x1 input projection, 100 learned object queries, per-decoder-layer class
(softmax, C+1 with background) and box (FFN -> sigmoid normalized cxcywh)
heads with deep supervision.

Shape-static rebuild notes:
- Hungarian matching (cls cost -p[label], L1 cost on normalized cxcywh x5,
  -GIoU x2; reference match_costs) runs per image over padded gts via
  ``tpudet.core.assigners.hungarian_assign`` (host LSA callback).
- Box normalization uses the static padded square input size; the
  reference normalizes by the per-image unpadded shape (detr_head.py uses
  img_meta['img_shape']). With letterboxed batches the difference is the
  pad margin; fed back consistently at decode, box parity is preserved.
- No attention key-padding mask: batches are fixed-size letterboxed.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.assigners import hungarian_assign
from ...core.bbox import bbox_overlaps_aligned, bbox_overlaps
from ...core.nms import NMSResult
from ...registry import HEADS
from ..utils.transformer import DetrTransformer, sine_positional_encoding


def cxcywh_to_xyxy(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def xyxy_to_cxcywh(b):
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], -1)


@HEADS.register_module()
class DETRHead(nn.Module):
    num_classes: int
    in_channels: int = 2048
    embed_dims: int = 256
    num_query: int = 100
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    ffn_dim: int = 2048
    # loss weights (reference configs/detr/detr_r50_8x2_150e_coco.py)
    bg_cls_weight: float = 0.1
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 5.0
    loss_iou_weight: float = 2.0
    # matcher costs
    cost_cls: float = 1.0
    cost_bbox: float = 5.0
    cost_iou: float = 2.0
    feat_stride: int = 32  # C5; input size = featmap size * stride
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats
        b, h, w, _ = x.shape
        x = nn.Conv(self.embed_dims, (1, 1), use_bias=True, dtype=self.dtype,
                    kernel_init=nn.initializers.xavier_uniform(),
                    name='input_proj')(x)
        x = x.reshape(b, h * w, self.embed_dims)
        pos = jnp.asarray(
            sine_positional_encoding(h, w, self.embed_dims // 2))
        query_embed = self.param(
            'query_embedding', nn.initializers.normal(1.0),
            (self.num_query, self.embed_dims))
        states = DetrTransformer(
            dim=self.embed_dims, num_heads=self.num_heads,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            ffn_dim=self.ffn_dim, dtype=self.dtype,
            name='transformer')(x, pos, query_embed)  # (L, B, Q, C)

        fc_cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                          name='fc_cls')
        reg_fc1 = nn.Dense(self.embed_dims, dtype=self.dtype, name='reg_fc1')
        reg_fc2 = nn.Dense(self.embed_dims, dtype=self.dtype, name='reg_fc2')
        fc_reg = nn.Dense(4, dtype=self.dtype, name='fc_reg')

        cls_all = fc_cls(states)  # (L, B, Q, C+1)
        r = jax.nn.relu(reg_fc1(states))
        r = jax.nn.relu(reg_fc2(r))
        bbox_all = jax.nn.sigmoid(fc_reg(r).astype(jnp.float32))
        # normalization factor back to input pixels (static)
        s = float(self.feat_stride)
        factor = jnp.asarray([w * s, h * s, w * s, h * s], jnp.float32)
        return cls_all.astype(jnp.float32), bbox_all, factor

    # ------------------------------------------------------------------
    def _match(self, cls_logits, bbox_norm, gts_norm, labels, valid):
        """Single image, single layer: returns (Q,) gt index or -1."""
        prob = jax.nn.softmax(cls_logits, -1)  # (Q, C+1)
        safe_labels = jnp.clip(labels, 0, self.num_classes - 1)
        cls_cost = -prob[:, safe_labels]  # (Q, G)
        # the matching L1 cost is in XYXY (BBoxL1Cost box_format default),
        # unlike the cxcywh L1 LOSS (match_cost.py BBoxL1Cost)
        bbox_cost = jnp.sum(
            jnp.abs(cxcywh_to_xyxy(bbox_norm)[:, None, :] - gts_norm[None]),
            -1)
        giou = bbox_overlaps(cxcywh_to_xyxy(bbox_norm), gts_norm,
                             mode='giou')  # (Q, G)
        cost = (self.cost_cls * cls_cost + self.cost_bbox * bbox_cost -
                self.cost_iou * giou)
        cost = jnp.where(valid[None, :], cost, 1e8)
        return hungarian_assign(cost, valid)

    def _layer_loss(self, cls_logits, bbox_norm, gts_norm, labels, valid):
        """Batched single-layer loss. cls (B,Q,C+1), bbox (B,Q,4)."""
        assigned = jax.vmap(self._match)(cls_logits, bbox_norm, gts_norm,
                                         labels, valid)  # (B, Q)
        pos = assigned >= 0
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        gt_idx = jnp.clip(assigned, 0, None)

        tgt_labels = jnp.where(
            pos, jnp.take_along_axis(labels, gt_idx, axis=1),
            self.num_classes)  # bg index C
        # CE with bg class weight 0.1 (reference bg_cls_weight)
        logp = jax.nn.log_softmax(cls_logits, -1)
        ce = -jnp.take_along_axis(logp, tgt_labels[..., None], -1)[..., 0]
        cls_w = jnp.where(pos, 1.0, self.bg_cls_weight)
        cls_avg = num_pos + jnp.sum(~pos) * self.bg_cls_weight
        loss_cls = self.loss_cls_weight * jnp.sum(ce * cls_w) / cls_avg

        tgt_boxes = jnp.take_along_axis(gts_norm, gt_idx[..., None], axis=1)
        tgt_boxes = jnp.where(pos[..., None], tgt_boxes,
                              cxcywh_to_xyxy(bbox_norm))
        l1 = jnp.sum(jnp.abs(bbox_norm - xyxy_to_cxcywh(tgt_boxes)), -1)
        loss_bbox = self.loss_bbox_weight * jnp.sum(
            l1 * pos) / num_pos
        giou = bbox_overlaps_aligned(cxcywh_to_xyxy(bbox_norm), tgt_boxes,
                                     mode='giou')
        loss_iou = self.loss_iou_weight * jnp.sum((1 - giou) * pos) / num_pos
        return loss_cls, loss_bbox, loss_iou

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        cls_all, bbox_all, factor = preds  # (L,B,Q,C+1), (L,B,Q,4), (4,)
        gts_norm = gt_bboxes / factor
        out = {}
        L = cls_all.shape[0]
        for lyr in range(L):
            lc, lb, li = self._layer_loss(cls_all[lyr], bbox_all[lyr],
                                          gts_norm, gt_labels, gt_valid)
            if lyr == L - 1:
                out['loss_cls'] = lc
                out['loss_bbox'] = lb
                out['loss_iou'] = li
            else:
                out[f'd{lyr}.loss_cls'] = lc
                out[f'd{lyr}.loss_bbox'] = lb
                out[f'd{lyr}.loss_iou'] = li
        out['num_gts'] = jnp.mean(jnp.sum(gt_valid.astype(jnp.float32),
                                          axis=1))
        return out

    # ------------------------------------------------------------------
    def get_bboxes(self, preds, scale_factors=None, max_per_img: int = 100,
                   score_thr: float = 0.0, **kwargs):
        """Reference detr_head._get_bboxes_single: softmax, drop bg column,
        top max_per_img (query, class) pairs, no NMS."""
        cls_all, bbox_all, factor = preds
        logits = cls_all[-1]  # (B, Q, C+1)
        boxes_n = bbox_all[-1]  # (B, Q, 4) normalized cxcywh
        b, q, _ = logits.shape
        prob = jax.nn.softmax(logits, -1)[..., :-1]  # (B, Q, C)
        k = min(max_per_img, q * self.num_classes)
        flat = prob.reshape(b, -1)
        scores, idx = jax.lax.top_k(flat, k)
        query_idx = idx // self.num_classes
        labels = (idx % self.num_classes).astype(jnp.int32)
        boxes = cxcywh_to_xyxy(
            jnp.take_along_axis(boxes_n, query_idx[..., None], axis=1))
        boxes = boxes * factor
        # clamp to the input frame (reference detr_head clamps to img_shape)
        boxes = jnp.clip(boxes, 0., factor[None, None, :])
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, :]
        valid = scores > score_thr
        return NMSResult(boxes, scores, labels, valid)
