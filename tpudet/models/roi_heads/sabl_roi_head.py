"""SABL two-stage bbox head (reference mmdet/models/roi_heads/
bbox_heads/sabl_head.py; configs configs/sabl/sabl_faster_rcnn_*).

Side-Aware Boundary Localization inside the RoI head:
- classification: 2 FCs over the flattened 7x7 features -> softmax C+1;
- localization: 2 3x3 pre-convs, attention pooling collapses the RoI map
  to per-axis 1-D features (learned column/row attention,
  sabl_head.py:219-236), a 1-D post conv, a 2x transposed-conv upsample
  to 14 positions, per-position FCs predicting a bucket logit and a fine
  offset, then the side-aware split (left half ++ flipped right half) so
  position ordering matches the bucketing coder's (l, r, t, b) targets;
- losses: CE cls; bucket BCE with neighbor-ignore + within-bucket
  smooth-L1 (beta 1/9), both weighted 1.0; decode rescales scores by the
  mean top-bucket confidence (bucketing-guided rescoring).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.bbox import BucketingBBoxCoder
from ...registry import DETECTORS, HEADS
from .. import losses as L
from ..detectors.two_stage import TwoStageDetector
from .standard_roi_head import StandardRoIHead


class SABLBBoxHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    fc_out_channels: int = 1024
    reg_feat_channels: int = 256
    roi_feat_size: int = 7
    num_buckets: int = 14
    up_ratio: int = 2
    dtype: Any = None

    @property
    def side_num(self):
        return int(np.ceil(self.num_buckets / 2.0))

    @nn.compact
    def __call__(self, roi_feats, train: bool = False):
        """(N, 7, 7, C) -> (cls (N, C+1), bucket_cls (N, 4S),
        bucket_offsets (N, 4S))."""
        n = roi_feats.shape[0]
        # --- classification branch
        x = roi_feats.reshape(n, -1)
        for i in range(2):
            x = jax.nn.relu(
                nn.Dense(self.fc_out_channels, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name=f'cls_fc{i}')(x))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       name='fc_cls')(x)

        # --- side-aware localization branch
        r = roi_feats
        for i in range(2):
            r = jax.nn.relu(
                nn.Conv(self.reg_feat_channels, (3, 3), padding='SAME',
                        use_bias=True, dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=f'reg_pre_conv{i}')(r))
        # attention pooling: column attention -> x feature (N, W, C),
        # row attention -> y feature (N, H, C)
        att_x = jax.nn.sigmoid(
            nn.Conv(1, (3, 3), padding='SAME', dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.01),
                    name='reg_conv_att_x')(r))  # (N, H, W, 1)
        att_y = jax.nn.sigmoid(
            nn.Conv(1, (3, 3), padding='SAME', dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.01),
                    name='reg_conv_att_y')(r))
        att_x = att_x / jnp.maximum(jnp.sum(att_x, axis=1, keepdims=True),
                                    1e-6)
        att_y = att_y / jnp.maximum(jnp.sum(att_y, axis=2, keepdims=True),
                                    1e-6)
        fx = jnp.sum(r * att_x, axis=1)  # (N, W, C)
        fy = jnp.sum(r * att_y, axis=2)  # (N, H, C)

        def axis_branch(f, name):
            f = jax.nn.relu(
                nn.Conv(self.reg_feat_channels, (3,), padding='SAME',
                        use_bias=True, dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=f'{name}_post')(f))
            f = jax.nn.relu(
                nn.ConvTranspose(self.reg_feat_channels,
                                 (self.up_ratio,), (self.up_ratio,),
                                 dtype=self.dtype,
                                 kernel_init=nn.initializers.he_normal(),
                                 name=f'{name}_up')(f))  # (N, 14, C)
            o = jax.nn.relu(
                nn.Dense(self.reg_feat_channels, dtype=self.dtype,
                         name=f'{name}_off_fc')(f))
            c = jax.nn.relu(
                nn.Dense(self.reg_feat_channels, dtype=self.dtype,
                         name=f'{name}_cls_fc')(f))
            off = nn.Dense(1, dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.001),
                           name=f'{name}_off')(o)[..., 0]  # (N, 14)
            bc = nn.Dense(1, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          name=f'{name}_cls')(c)[..., 0]
            return off, bc

        off_x, cls_x = axis_branch(fx, 'x')
        off_y, cls_y = axis_branch(fy, 'y')

        up = self.roi_feat_size * self.up_ratio

        def split(feat):
            """left half ++ flipped right half (sabl_head.py:276-289)."""
            l_end = int(np.ceil(up / 2))
            r_start = int(np.floor(up / 2))
            return jnp.concatenate(
                [feat[:, :l_end], feat[:, r_start:][:, ::-1]], axis=-1)

        # order (l, r, t, b) matches the bucketing coder's side stacking
        bucket_cls = jnp.concatenate([split(cls_x), split(cls_y)], -1)
        bucket_off = jnp.concatenate([split(off_x), split(off_y)], -1)
        return cls, bucket_cls, bucket_off


@HEADS.register_module()
class SABLRoIHead(StandardRoIHead):
    num_buckets: int = 14
    scale_factor: float = 1.7  # sabl faster-rcnn config scale factor
    loss_bucket_cls_weight: float = 1.0
    loss_bucket_reg_weight: float = 1.0

    def setup(self):
        self.bbox_head = SABLBBoxHead(
            num_classes=self.num_classes, in_channels=self.in_channels,
            roi_feat_size=self.roi_size, num_buckets=self.num_buckets,
            dtype=self.dtype)

    @property
    def bucket_coder(self):
        return BucketingBBoxCoder(self.num_buckets, self.scale_factor)

    def __call__(self, feats, rois, roi_valid, train: bool = False):
        pooled = self.extract(feats, rois, roi_valid)
        b, p = pooled.shape[:2]
        flat = pooled.reshape((b * p,) + pooled.shape[2:])
        cls, bc, bo = self.bbox_head(flat, train)
        rs = lambda t: t.reshape((b, p) + t.shape[1:])  # noqa: E731
        return rs(cls), (rs(bc), rs(bo))

    def loss(self, cls_logits, deltas, labels, targets, pos, sampled,
             rois=None) -> Dict:
        bucket_cls, bucket_off = deltas
        num_total = jnp.maximum(jnp.sum(sampled.astype(jnp.float32)), 1.0)
        logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), -1)
        ce = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        loss_cls = jnp.sum(ce * sampled) / num_total

        # matched gt boxes recovered from the generic delta targets
        assert rois is not None
        gt_boxes = self.bbox_coder.decode(rois, targets)
        b_lab, b_clsw, b_off, b_offw = self.bucket_coder.encode(rois,
                                                                gt_boxes)
        S = self.bucket_coder.side_num
        bc = bucket_cls.astype(jnp.float32).reshape(b_lab.shape)
        bo = bucket_off.astype(jnp.float32).reshape(b_off.shape)
        w = pos[..., None, None].astype(jnp.float32)
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        bce = L.binary_cross_entropy_with_logits(bc, b_lab)
        loss_bucket_cls = self.loss_bucket_cls_weight * jnp.sum(
            bce * b_clsw * w) / (num_pos * 4 * S)
        diff = jnp.abs(bo - b_off)
        beta = 1.0 / 9.0
        sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                        diff - 0.5 * beta)
        loss_bucket_reg = self.loss_bucket_reg_weight * jnp.sum(
            sl1 * b_offw * w) / (num_pos * 4)
        return dict(loss_cls=loss_cls, loss_bucket_cls=loss_bucket_cls,
                    loss_bucket_reg=loss_bucket_reg)

    def get_bboxes(self, rois, roi_valid, cls_logits, deltas,
                   scale_factors=None, score_thr: float = 0.05,
                   iou_thr: float = 0.5, max_per_img: int = 100, **kwargs):
        from ...core.nms import NEG_INF, NMSResult, nms_padded
        bucket_cls, bucket_off = deltas
        scores = jax.nn.softmax(cls_logits.astype(jnp.float32),
                                -1)[..., :-1]
        decoded = self.bucket_coder.decode(
            rois, (bucket_cls.astype(jnp.float32),
                   bucket_off.astype(jnp.float32)))
        if isinstance(decoded, tuple):
            boxes, confids = decoded
            scores = scores * confids[..., None]
        else:
            boxes = decoded
        scores = scores * roi_valid[..., None]
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, :]
        b, p = rois.shape[:2]
        flat_scores = scores.reshape(b, -1)
        labels = jnp.tile(jnp.arange(self.num_classes, dtype=jnp.int32), p)
        box_rep = jnp.repeat(boxes, self.num_classes, axis=1)

        def one(bx, sc):
            valid = sc > score_thr
            k = min(2048, sc.shape[0])
            top_s, top_i = jax.lax.top_k(jnp.where(valid, sc, NEG_INF), k)
            top_valid = top_s > NEG_INF / 2
            cand = bx[top_i]
            lab = labels[top_i]
            max_coord = jnp.max(jnp.where(top_valid[:, None], cand, 0.))
            off = cand + (lab.astype(cand.dtype) * (max_coord + 1.))[:,
                                                                     None]
            keep_idx, keep_valid = nms_padded(off, top_s, iou_thr,
                                              max_per_img, top_valid)
            return NMSResult(
                jnp.where(keep_valid[:, None], cand[keep_idx], 0.),
                jnp.where(keep_valid, top_s[keep_idx], 0.),
                jnp.where(keep_valid, lab[keep_idx], -1), keep_valid)

        return jax.vmap(one)(box_rep, flat_scores)


@DETECTORS.register_module()
class SABLFasterRCNN(TwoStageDetector):
    """Named wrapper for configs/sabl/sabl_faster_rcnn_* (the reference
    reuses type='FasterRCNN' with the SABLHead bbox head)."""
