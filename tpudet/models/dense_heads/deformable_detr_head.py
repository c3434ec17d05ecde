"""Deformable DETR (reference mmdet/models/dense_heads/
deformable_detr_head.py, utils/transformer.py:254-683 —
DeformableDetrTransformer — and the mmcv MultiScaleDeformableAttention
op; config configs/deformable_detr/deformable_detr_r50_16x2_50e_coco.py).

- Multi-scale deformable attention: each query samples ``num_points``
  bilinear taps per head per pyramid level at learned offsets around its
  reference point, mixing them with a softmax over (level, point); the
  reference CUDA kernel becomes a pure-XLA bilinear gather (the same
  align_corners=False convention as the reference's grid_sample path).
- 6-layer encoder over the flattened C3..C6 features with per-level
  embeddings and per-position reference points; 6-layer decoder with
  self-attention + deformable cross-attention on 300 queries whose 2-d
  reference points come from a linear layer on the query embedding.
- Per-layer heads: sigmoid focal classification (no background column),
  box FFN added to the inverse-sigmoid reference point; Hungarian
  matching with focal cls cost + L1 + GIoU; deep supervision.
- ``with_box_refine``: each decoder layer's box output becomes the next
  layer's (4-d) reference (reference transformer.py:254-341).

Shape-static notes: batches are fixed-size letterboxed squares, so the
reference's padding masks/valid ratios are identity and are omitted.
``as_two_stage`` (encoder proposals) is not yet implemented.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.assigners import hungarian_assign
from ...core.bbox import bbox_overlaps, bbox_overlaps_aligned
from ...core.nms import NMSResult
from ...registry import DETECTORS, HEADS
from .. import losses as L
from ..detectors.single_stage import SingleStageDetector
from ..utils.transformer import _FFN, _MHA, sine_positional_encoding
from .detr_head import cxcywh_to_xyxy, xyxy_to_cxcywh


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def _offset_bias_init(h, lv, p):
    """mmcv MSDeformAttn offset bias init: head-wise unit directions
    scaled 1..num_points."""
    thetas = np.arange(h, dtype=np.float32) * (2 * np.pi / h)
    direc = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (h, 2)
    direc = direc / np.abs(direc).max(-1, keepdims=True)
    grid = np.tile(direc[:, None, None, :], (1, lv, p, 1))
    grid = grid * np.arange(1, p + 1,
                            dtype=np.float32)[None, None, :, None]
    flat = grid.reshape(-1)

    def init(key, shape, dtype=jnp.float32):
        del key
        return jnp.asarray(flat.reshape(shape), dtype)

    return init


class MSDeformAttention(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, query, value, shapes, reference_points):
        """query (B,Q,C); value (B,S,C) flattened levels; shapes: static
        list of (H, W); reference_points (B,Q,2) or (B,Q,4) normalized."""
        b, q, c = query.shape
        h, lv, p = self.num_heads, self.num_levels, self.num_points
        hd = self.embed_dims // h

        off = nn.Dense(h * lv * p * 2, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       bias_init=_offset_bias_init(h, lv, p),
                       name='sampling_offsets')(query)
        off = off.astype(jnp.float32).reshape(b, q, h, lv, p, 2)
        attn = nn.Dense(h * lv * p, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name='attention_weights')(query)
        attn = jax.nn.softmax(
            attn.astype(jnp.float32).reshape(b, q, h, lv * p), -1)
        attn = attn.reshape(b, q, h, lv, p)

        v = nn.Dense(self.embed_dims, dtype=self.dtype,
                     name='value_proj')(value)

        ref = reference_points.astype(jnp.float32)
        if ref.shape[-1] == 2:
            wh = jnp.asarray([[wd, ht] for ht, wd in shapes], jnp.float32)
            loc = ref[:, :, None, None, None, :] + \
                off / wh[None, None, None, :, None, :]
        else:  # 4-d refs (box refine): offsets scaled by the box size
            loc = ref[:, :, None, None, None, :2] + \
                off / p * ref[:, :, None, None, None, 2:] * 0.5

        # split value back into levels and sample
        sizes = [hh * ww for hh, ww in shapes]
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        out = 0.
        for li, (hh, ww) in enumerate(shapes):
            v_l = jax.lax.dynamic_slice_in_dim(v, int(starts[li]),
                                               sizes[li], axis=1)
            v_l = v_l.reshape(b, hh, ww, self.embed_dims).astype(
                jnp.float32)
            pts = loc[:, :, :, li]  # (B, Q, h, p, 2)
            x = pts[..., 0] * ww - 0.5
            y = pts[..., 1] * hh - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            fx = x - x0
            fy = y - y0

            def tap(img, yy, xx):
                # img (hh, ww, C); yy/xx (Q, h, p)
                yi = jnp.clip(yy, 0, hh - 1).astype(jnp.int32)
                xi = jnp.clip(xx, 0, ww - 1).astype(jnp.int32)
                vv = img[yi, xi]  # (Q, h, p, C)
                inb = ((yy >= 0) & (yy <= hh - 1) & (xx >= 0) &
                       (xx <= ww - 1))[..., None]
                return vv * inb

            def sample_one(img, x0_, y0_, fx_, fy_):
                v00 = tap(img, y0_, x0_)
                v01 = tap(img, y0_, x0_ + 1)
                v10 = tap(img, y0_ + 1, x0_)
                v11 = tap(img, y0_ + 1, x0_ + 1)
                return ((1 - fy_[..., None]) *
                        ((1 - fx_[..., None]) * v00 + fx_[..., None] * v01)
                        + fy_[..., None] *
                        ((1 - fx_[..., None]) * v10 + fx_[..., None] * v11))

            smp = jax.vmap(sample_one)(v_l, x0, y0, fx, fy)
            # (B, Q, h, p, C) -> per-head channels
            smp = smp.reshape(b, q, h, p, h, hd)
            # take the head's own channel block
            idx = jnp.arange(h)
            smp = smp[:, :, idx, :, idx]  # -> (h, B, Q, p, hd)
            smp = jnp.moveaxis(smp, 0, 2)  # (B, Q, h, p, hd)
            out = out + jnp.sum(smp * attn[:, :, :, li, :, None], axis=3)

        out = out.reshape(b, q, self.embed_dims)
        return nn.Dense(self.embed_dims, dtype=self.dtype,
                        name='output_proj')(out)


class DeformableEncoderLayer(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    ffn_dim: int = 1024
    dtype: Any = None

    @nn.compact
    def __call__(self, x, pos, shapes, ref):
        a = MSDeformAttention(self.embed_dims, self.num_heads,
                              self.num_levels, self.num_points,
                              dtype=self.dtype, name='attn')(
                                  x + pos, x, shapes, ref)
        x = nn.LayerNorm(dtype=self.dtype, name='norm1')(x + a)
        f = _FFN(self.embed_dims, self.ffn_dim, dtype=self.dtype,
                 name='ffn')(x)
        return nn.LayerNorm(dtype=self.dtype, name='norm2')(x + f)


class DeformableDecoderLayer(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    ffn_dim: int = 1024
    dtype: Any = None

    @nn.compact
    def __call__(self, tgt, memory, query_pos, shapes, ref):
        q = tgt + query_pos
        sa = _MHA(self.embed_dims, self.num_heads, dtype=self.dtype,
                  name='self_attn')(q, q, tgt)
        tgt = nn.LayerNorm(dtype=self.dtype, name='norm1')(tgt + sa)
        ca = MSDeformAttention(self.embed_dims, self.num_heads,
                               self.num_levels, self.num_points,
                               dtype=self.dtype, name='cross_attn')(
                                   tgt + query_pos, memory, shapes, ref)
        tgt = nn.LayerNorm(dtype=self.dtype, name='norm2')(tgt + ca)
        f = _FFN(self.embed_dims, self.ffn_dim, dtype=self.dtype,
                 name='ffn')(tgt)
        return nn.LayerNorm(dtype=self.dtype, name='norm3')(tgt + f)


@HEADS.register_module()
class DeformableDETRHead(nn.Module):
    num_classes: int
    in_channels: Tuple[int, ...] = (512, 1024, 2048)
    embed_dims: int = 256
    num_query: int = 300
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    ffn_dim: int = 1024
    with_box_refine: bool = False
    # losses (reference config: focal 2.0, L1 5.0, GIoU 2.0)
    loss_cls_weight: float = 2.0
    loss_bbox_weight: float = 5.0
    loss_iou_weight: float = 2.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: C3..C5 pyramid (tuple). Builds 4 levels (extra stride-2
        conv on the last, reference neck add_extra_convs='on_output' with
        ChannelMapper). Returns (cls_all (L,B,Q,C), bbox_all (L,B,Q,4)
        normalized cxcywh, factor (4,))."""
        feats = list(feats[-len(self.in_channels):])
        # input projections + extra level
        proj = []
        for i, f in enumerate(feats):
            x = nn.Conv(self.embed_dims, (1, 1), use_bias=True,
                        dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f'input_proj{i}')(f)
            proj.append(nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                     name=f'input_gn{i}')(x))
        extra = nn.Conv(self.embed_dims, (3, 3), (2, 2), padding='SAME',
                        use_bias=True, dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name='input_proj_extra')(feats[-1])
        proj.append(nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                 name='input_gn_extra')(extra))

        b = proj[0].shape[0]
        shapes = [tuple(x.shape[1:3]) for x in proj]
        level_embed = self.param('level_embeds',
                                 nn.initializers.normal(1.0),
                                 (len(proj), self.embed_dims))
        flat, pos_flat, enc_ref = [], [], []
        for li, x in enumerate(proj):
            hh, ww = shapes[li]
            flat.append(x.reshape(b, hh * ww, self.embed_dims))
            pos = jnp.asarray(sine_positional_encoding(
                hh, ww, self.embed_dims // 2))
            pos_flat.append(pos[None] + level_embed[li][None, None])
            ys = (jnp.arange(hh, dtype=jnp.float32) + 0.5) / hh
            xs = (jnp.arange(ww, dtype=jnp.float32) + 0.5) / ww
            ref = jnp.stack([jnp.tile(xs, hh), jnp.repeat(ys, ww)], -1)
            enc_ref.append(ref)
        memory = jnp.concatenate(flat, axis=1)  # (B, S, C)
        pos_all = jnp.concatenate(
            [jnp.broadcast_to(p, (b,) + p.shape[1:]) for p in pos_flat],
            axis=1)
        ref_all = jnp.broadcast_to(
            jnp.concatenate(enc_ref, axis=0)[None],
            (b, memory.shape[1], 2))

        for i in range(self.num_encoder_layers):
            memory = DeformableEncoderLayer(
                self.embed_dims, self.num_heads, len(proj),
                self.num_points, self.ffn_dim, dtype=self.dtype,
                name=f'enc{i}')(memory, pos_all, shapes, ref_all)

        # decoder: query embedding splits into (query_pos, query)
        qe = self.param('query_embedding', nn.initializers.normal(1.0),
                        (self.num_query, self.embed_dims * 2))
        query_pos = jnp.broadcast_to(
            qe[None, :, :self.embed_dims],
            (b, self.num_query, self.embed_dims))
        tgt = jnp.broadcast_to(qe[None, :, self.embed_dims:],
                               (b, self.num_query, self.embed_dims))
        ref2 = jax.nn.sigmoid(
            nn.Dense(2, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(),
                     name='reference_points')(query_pos).astype(
                         jnp.float32))  # (B, Q, 2)

        n_branch = self.num_decoder_layers if self.with_box_refine else 1
        cls_branches = [
            nn.Dense(self.num_classes, dtype=self.dtype,
                     bias_init=nn.initializers.constant(-math.log(99.)),
                     name=f'cls_branch{i}') for i in range(n_branch)
        ]
        reg_branches = [
            [nn.Dense(self.embed_dims, dtype=self.dtype,
                      name=f'reg_branch{i}_fc{j}') for j in range(2)] +
            [nn.Dense(4, dtype=self.dtype, name=f'reg_branch{i}_out')]
            for i in range(n_branch)
        ]

        cls_all, bbox_all = [], []
        ref = ref2
        for i in range(self.num_decoder_layers):
            ridx = i if self.with_box_refine else 0
            tgt = DeformableDecoderLayer(
                self.embed_dims, self.num_heads, len(proj),
                self.num_points, self.ffn_dim, dtype=self.dtype,
                name=f'dec{i}')(tgt, memory, query_pos, shapes, ref)
            cls_all.append(cls_branches[ridx](tgt).astype(jnp.float32))
            r = tgt
            for fc in reg_branches[ridx][:-1]:
                r = jax.nn.relu(fc(r))
            tmp = reg_branches[ridx][-1](r).astype(jnp.float32)
            if ref.shape[-1] == 4:
                tmp = tmp + inverse_sigmoid(ref)
            else:
                tmp = tmp.at[..., :2].add(inverse_sigmoid(ref))
            box = jax.nn.sigmoid(tmp)
            bbox_all.append(box)
            if self.with_box_refine:
                ref = jax.lax.stop_gradient(box)

        h0, w0 = shapes[0]
        stride0 = 8  # C3
        factor = jnp.asarray([w0 * stride0, h0 * stride0,
                              w0 * stride0, h0 * stride0], jnp.float32)
        return (jnp.stack(cls_all), jnp.stack(bbox_all), factor)

    # ------------------------------------------------------------------
    def _match(self, cls_logits, bbox_norm, gts_norm, labels, valid):
        prob = jax.nn.sigmoid(cls_logits)  # (Q, C)
        safe = jnp.clip(labels, 0, self.num_classes - 1)
        a, g = self.focal_alpha, self.focal_gamma
        pos_cost = -a * ((1 - prob)**g) * jnp.log(prob + 1e-8)
        neg_cost = -(1 - a) * (prob**g) * jnp.log(1 - prob + 1e-8)
        cls_cost = (pos_cost - neg_cost)[:, safe]  # (Q, G)
        bbox_cost = jnp.sum(
            jnp.abs(bbox_norm[:, None] - xyxy_to_cxcywh(gts_norm)[None]),
            -1)
        giou = bbox_overlaps(cxcywh_to_xyxy(bbox_norm), gts_norm,
                             mode='giou')
        cost = (self.loss_cls_weight * cls_cost +
                self.loss_bbox_weight * bbox_cost -
                self.loss_iou_weight * giou)
        cost = jnp.where(valid[None, :], cost, 1e8)
        return hungarian_assign(cost, valid)

    def _layer_loss(self, cls_logits, bbox_norm, gts_norm, labels, valid):
        assigned = jax.vmap(self._match)(cls_logits, bbox_norm, gts_norm,
                                         labels, valid)
        pos = assigned >= 0
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        gt_idx = jnp.clip(assigned, 0, None)
        tgt_labels = jnp.take_along_axis(labels, gt_idx, axis=1)
        onehot = jax.nn.one_hot(tgt_labels, self.num_classes) * \
            pos[..., None]
        loss_cls = L.sigmoid_focal_loss(
            cls_logits, onehot, gamma=self.focal_gamma,
            alpha=self.focal_alpha, avg_factor=num_pos,
            loss_weight=self.loss_cls_weight)
        tgt_boxes = jnp.take_along_axis(gts_norm, gt_idx[..., None], 1)
        tgt_boxes = jnp.where(pos[..., None], tgt_boxes,
                              cxcywh_to_xyxy(bbox_norm))
        l1 = jnp.sum(jnp.abs(bbox_norm - xyxy_to_cxcywh(tgt_boxes)), -1)
        loss_bbox = self.loss_bbox_weight * jnp.sum(l1 * pos) / num_pos
        giou = bbox_overlaps_aligned(cxcywh_to_xyxy(bbox_norm), tgt_boxes,
                                     mode='giou')
        loss_iou = self.loss_iou_weight * jnp.sum((1 - giou) * pos) / \
            num_pos
        return loss_cls, loss_bbox, loss_iou

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        cls_all, bbox_all, factor = preds
        gts_norm = gt_bboxes / factor
        out = {}
        nl = cls_all.shape[0]
        for lyr in range(nl):
            lc, lb, li = self._layer_loss(cls_all[lyr], bbox_all[lyr],
                                          gts_norm, gt_labels, gt_valid)
            if lyr == nl - 1:
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

    def get_bboxes(self, preds, scale_factors=None, max_per_img: int = 100,
                   score_thr: float = 0.0, **kwargs):
        cls_all, bbox_all, factor = preds
        logits = cls_all[-1]
        boxes_n = bbox_all[-1]
        b, q, _ = logits.shape
        prob = jax.nn.sigmoid(logits)  # (B, Q, C)
        k = min(max_per_img, q * self.num_classes)
        flat = prob.reshape(b, -1)
        scores, idx = jax.lax.top_k(flat, k)
        query_idx = idx // self.num_classes
        labels = (idx % self.num_classes).astype(jnp.int32)
        boxes = cxcywh_to_xyxy(
            jnp.take_along_axis(boxes_n, query_idx[..., None], axis=1))
        boxes = jnp.clip(boxes * factor, 0., factor[None, None, :])
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, :]
        return NMSResult(boxes, scores, labels, scores > score_thr)


@DETECTORS.register_module()
class DeformableDETR(SingleStageDetector):
    """Deformable DETR detector (reference detectors/deformable_detr.py)."""

    def get_bboxes(self, pred_maps, **kwargs):
        cfg = dict(self.test_cfg or {})
        cfg.pop('nms', None)
        cfg.pop('min_bbox_size', None)
        cfg.pop('nms_pre', None)
        cfg.update(kwargs)
        return self.bbox_head.get_bboxes(pred_maps, **cfg)
