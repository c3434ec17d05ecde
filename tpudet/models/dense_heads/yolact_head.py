"""YOLACT (reference mmdet/models/dense_heads/yolact_head.py: YOLACTHead,
YOLACTSegmHead, YOLACTProtonet; detectors/yolact.py).

Single-stage instance segmentation:
- anchor head (3 ratios x 1 scale per level, shared conv) predicting
  cls (softmax C+1, OHEM 3:1), SmoothL1 boxes (w=1.5) and 32 prototype
  coefficients (tanh);
- protonet on P3: 3 convs + 2x upsample + conv -> 32 prototype maps;
  instance mask = sigmoid(protos . coeffs), supervised inside the gt box
  (loss normalized by box area, weight 6.125) — here the prediction is
  RoI-aligned into the gt-box frame and BCE'd against the static gt-frame
  mask, which is the same crop-normalized objective;
- an auxiliary semantic head on P3 (per-class sigmoid BCE, weight 1.0);
- test: fast NMS + per-detection mask assembly.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors import AnchorGenerator
from ...core.assigners import NEGATIVE, max_iou_assign_batch
from ...core.bbox import DeltaXYWHBBoxCoder
from ...core.nms import NMSResult, fast_nms
from ...ops.roi_align import roi_align
from ...registry import DETECTORS, HEADS
from .. import losses as L
from ..detectors.single_stage import SingleStageDetector


@HEADS.register_module()
class YOLACTHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    num_head_convs: int = 1
    num_protos: int = 32
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    octave_base_scale: int = 3
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    neg_pos_ratio: int = 3
    loss_bbox_weight: float = 1.5
    dtype: Any = None

    @property
    def num_anchors(self):
        return len(self.ratios)

    @property
    def anchor_generator(self):
        return AnchorGenerator(strides=list(self.strides),
                               ratios=list(self.ratios),
                               octave_base_scale=self.octave_base_scale,
                               scales_per_octave=1)

    @property
    def bbox_coder(self):
        return DeltaXYWHBBoxCoder(target_stds=self.target_stds)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        head_convs = [
            nn.Conv(self.feat_channels, (3, 3), padding='SAME',
                    use_bias=True, dtype=self.dtype,
                    kernel_init=nn.initializers.he_normal(),
                    name=f'head_conv{i}')
            for i in range(self.num_head_convs)
        ]
        conv_cls = nn.Conv(self.num_anchors * (self.num_classes + 1), (3, 3),
                           padding='SAME', use_bias=True, dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_cls')
        conv_reg = nn.Conv(self.num_anchors * 4, (3, 3), padding='SAME',
                           use_bias=True, dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_reg')
        conv_coeff = nn.Conv(self.num_anchors * self.num_protos, (3, 3),
                             padding='SAME', use_bias=True, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name='conv_coeff')
        cls_out, reg_out, coeff_out = [], [], []
        for x in feats:
            for conv in head_convs:
                x = jax.nn.relu(conv(x))
            cls_out.append(conv_cls(x))
            reg_out.append(conv_reg(x))
            # tanh coefficients (yolact_head forward_single)
            coeff_out.append(jnp.tanh(conv_coeff(x).astype(jnp.float32)))
        return tuple(cls_out), tuple(reg_out), tuple(coeff_out)

    # ------------------------------------------------------------------
    def _flat_anchors(self, featmap_sizes):
        return np.concatenate(
            self.anchor_generator.grid_anchors(featmap_sizes), axis=0)

    def flatten(self, preds):
        cls_scores, bbox_preds, coeffs = preds
        b = cls_scores[0].shape[0]
        cls_flat = jnp.concatenate([
            c.reshape(b, -1, self.num_classes + 1).astype(jnp.float32)
            for c in cls_scores], axis=1)
        reg_flat = jnp.concatenate([
            r.reshape(b, -1, 4).astype(jnp.float32) for r in bbox_preds],
            axis=1)
        coeff_flat = jnp.concatenate([
            c.reshape(b, -1, self.num_protos) for c in coeffs], axis=1)
        return cls_flat, reg_flat, coeff_flat

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid) -> Dict:
        cls_scores, bbox_preds, _ = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        anchors = jnp.asarray(self._flat_anchors(featmap_sizes))
        cls_flat, reg_flat, _ = self.flatten(preds)

        # YOLACT's assigner is the one shipped config with
        # gt_max_assign_all=False: IoU ties for a gt's best anchor keep
        # only the FIRST anchor (configs/yolact/yolact_r50_1x8_coco.py:74)
        from ...core.assigners import max_iou_assign
        assigned = jax.vmap(
            lambda g, gv: max_iou_assign(
                anchors, g, gv, self.pos_iou_thr, self.neg_iou_thr, 0.,
                True, gt_max_assign_all=False))(gt_bboxes, gt_valid)
        pos = assigned >= 0
        neg = assigned == NEGATIVE
        # reference normalizer: sum over images of max(num_pos_img, 1)
        # (anchor_head.py get_targets: num_total_pos = sum(max(inds, 1)))
        num_pos = jnp.sum(jnp.maximum(
            jnp.sum(pos.astype(jnp.float32), axis=1), 1.0))
        gt_idx = jnp.clip(assigned, 0, None)
        labels = jnp.where(pos,
                           jnp.take_along_axis(gt_labels, gt_idx, axis=1),
                           self.num_classes)  # bg = C

        # OHEM CE: all positives + 3x hardest negatives (SSD-style)
        logp = jax.nn.log_softmax(cls_flat, -1)
        ce = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        neg_loss = jnp.where(neg, ce, -1.0)
        rank = jnp.argsort(jnp.argsort(-neg_loss, axis=1), axis=1)
        n_pos_img = jnp.sum(pos.astype(jnp.float32), axis=1, keepdims=True)
        # reference loss_single_OHEM (yolact_head.py:273-277): an image
        # with zero positives contributes ALL its negatives, not zero
        neg_limit = jnp.where(n_pos_img > 0,
                              self.neg_pos_ratio * n_pos_img,
                              jnp.inf)
        hard_neg = neg & (rank < neg_limit)
        cls_w = (pos | hard_neg).astype(jnp.float32)
        loss_cls = jnp.sum(ce * cls_w) / num_pos

        matched = jnp.take_along_axis(gt_bboxes, gt_idx[..., None], axis=1)
        matched = jnp.where(pos[..., None], matched,
                            jnp.broadcast_to(anchors[None], matched.shape))
        targets = self.bbox_coder.encode(anchors[None], matched)
        loss_bbox = L.smooth_l1_loss(
            reg_flat, targets, beta=1.0,
            weight=pos[..., None].astype(jnp.float32), avg_factor=num_pos,
            loss_weight=self.loss_bbox_weight)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    num_gts=jnp.mean(jnp.sum(gt_valid.astype(jnp.float32),
                                             axis=1)))

    def get_bboxes(self, preds, scale_factors=None, score_thr: float = 0.05,
                   iou_thr: float = 0.5, max_per_img: int = 100,
                   nms_pre: int = 1000, **kwargs):
        cls_scores, bbox_preds, coeffs = preds
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        anchors = jnp.asarray(self._flat_anchors(featmap_sizes))
        cls_flat, reg_flat, coeff_flat = self.flatten(preds)
        scores = jax.nn.softmax(cls_flat, -1)[..., :-1]  # drop bg
        boxes = self.bbox_coder.decode(anchors[None], reg_flat)
        b = boxes.shape[0]
        k = min(nms_pre, boxes.shape[1])
        max_s = jnp.max(scores, -1)
        _, topk = jax.lax.top_k(max_s, k)
        boxes = jnp.take_along_axis(boxes, topk[..., None], axis=1)
        scores = jnp.take_along_axis(scores, topk[..., None], axis=1)
        coeff_sel = jnp.take_along_axis(coeff_flat, topk[..., None], axis=1)
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, :]

        def one(bx, sc, cf):
            res, keep_idx = fast_nms(bx, sc, score_thr, iou_thr,
                                     max_per_img=max_per_img,
                                     return_indices=True)
            return res.bboxes, res.scores, res.labels, cf[keep_idx], \
                res.valid

        db, ds, dl, dc, dv = jax.vmap(one)(boxes, scores, coeff_sel)
        return NMSResult(db, ds, dl, dv), dc


@HEADS.register_module()
class YOLACTProtonet(nn.Module):
    """Protonet on P3 (yolact_head.py YOLACTProtonet)."""
    num_protos: int = 32
    in_channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, p3, train: bool = False):
        x = p3
        for i in range(3):
            x = jax.nn.relu(
                nn.Conv(256, (3, 3), padding='SAME', use_bias=True,
                        dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=f'conv{i}')(x))
        b, h, w, c = x.shape
        x = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)
        x = jax.nn.relu(
            nn.Conv(256, (3, 3), padding='SAME', use_bias=True,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.he_normal(),
                    name='conv3')(x))
        return jax.nn.relu(
            nn.Conv(self.num_protos, (1, 1), use_bias=True,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.he_normal(),
                    name='conv_out')(x)).astype(jnp.float32)


@HEADS.register_module()
class YOLACTSegmHead(nn.Module):
    """Aux semantic head on P3 (yolact_head.py YOLACTSegmHead)."""
    num_classes: int
    in_channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, p3, train: bool = False):
        return nn.Conv(self.num_classes, (1, 1), use_bias=True,
                       dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       name='segm_conv')(p3).astype(jnp.float32)


@DETECTORS.register_module()
class YOLACT(SingleStageDetector):
    """YOLACT detector. ``bbox_head`` is a YOLACTHead; protonet and segm
    head are built from ``train_cfg/test_cfg``-independent fields below."""
    mask_proto_stride: int = 4  # protonet output stride (P3 upsampled 2x)
    max_masks: int = 100
    loss_mask_weight: float = 6.125

    def setup(self):
        self.protonet = YOLACTProtonet(
            num_protos=self.bbox_head.num_protos)
        self.segm_head = YOLACTSegmHead(num_classes=self.bbox_head.
                                        num_classes)

    def __call__(self, img, train: bool = False):
        feats = self.extract_feat(img, train)
        preds = self.bbox_head(feats, train)
        protos = self.protonet(feats[0], train)
        segm = self.segm_head(feats[0], train)
        return preds, protos, segm

    def forward_train(self, img, gt_bboxes, gt_labels, gt_valid,
                      gt_frame_masks):
        preds, protos, segm = self(img, train=True)
        losses = self.bbox_head.loss(preds, gt_bboxes, gt_labels, gt_valid)

        # ---- mask loss on up-to-max_masks positives per image
        head = self.bbox_head
        featmap_sizes = [tuple(c.shape[1:3]) for c in preds[0]]
        anchors = jnp.asarray(head._flat_anchors(featmap_sizes))
        _, _, coeff_flat = head.flatten(preds)
        assigned = max_iou_assign_batch(anchors, gt_bboxes, gt_valid,
                                        head.pos_iou_thr, head.neg_iou_thr,
                                        0., True)
        pos = assigned >= 0
        k = min(self.max_masks, assigned.shape[1])
        order = jnp.argsort(~pos, axis=1, stable=True)[:, :k]
        sel_pos = jnp.take_along_axis(pos, order, axis=1)
        sel_gt = jnp.take_along_axis(jnp.clip(assigned, 0, None), order,
                                     axis=1)
        sel_coeff = jnp.take_along_axis(
            coeff_flat, order[..., None], axis=1)  # (B, K, 32)

        mask_s = gt_frame_masks.shape[-1]

        def one(protos_i, coeff_i, gt_i, pos_i, boxes_i, masks_i):
            maps = jnp.einsum('hwp,kp->khw', protos_i, coeff_i)
            boxes = boxes_i[gt_i] / self.mask_proto_stride  # (K, 4)
            # sample each prediction into its gt-box frame
            crops = jax.vmap(
                lambda m, bx: roi_align(m[..., None], bx[None], mask_s)[0,
                                                                        ...,
                                                                        0]
            )(maps, boxes)
            tgt = masks_i[gt_i]
            bce = L.binary_cross_entropy_with_logits(crops,
                                                     jnp.clip(tgt, 0., 1.))
            return (jnp.sum(jnp.mean(bce, axis=(1, 2)) * pos_i),
                    jnp.sum(pos_i))

        sums, counts = jax.vmap(one)(protos, sel_coeff, sel_gt,
                                     sel_pos.astype(jnp.float32), gt_bboxes,
                                     gt_frame_masks)
        losses['loss_mask'] = self.loss_mask_weight * jnp.sum(sums) / \
            jnp.maximum(jnp.sum(counts), 1.0)

        # ---- aux semantic loss: per-class max of gt-box-rasterized masks
        sh, sw = segm.shape[1:3]
        stride_h = img.shape[1] / sh

        def segm_tgt_one(boxes_i, labels_i, valid_i, masks_i):
            # paste each gt's frame mask into the segm grid (coarse: box
            # region marked by its resized mask via roi-align inverse is
            # expensive; use box rasterization weighted by mask mean)
            ys = (jnp.arange(sh, dtype=jnp.float32) + 0.5) * stride_h
            xs = (jnp.arange(sw, dtype=jnp.float32) + 0.5) * stride_h
            inside = ((xs[None, None, :] >= boxes_i[:, None, None, 0]) &
                      (xs[None, None, :] <= boxes_i[:, None, None, 2]) &
                      (ys[None, :, None] >= boxes_i[:, None, None, 1]) &
                      (ys[None, :, None] <= boxes_i[:, None, None, 3]) &
                      valid_i[:, None, None])  # (G, sh, sw)
            onehot = jax.nn.one_hot(labels_i,
                                    self.bbox_head.num_classes)  # (G, C)
            return jnp.max(inside[..., None] * onehot[:, None, None, :],
                           axis=0)

        segm_tgt = jax.vmap(segm_tgt_one)(gt_bboxes, gt_labels, gt_valid,
                                          gt_frame_masks)
        losses['loss_segm'] = L.bce_loss(
            segm, segm_tgt,
            avg_factor=jnp.asarray(segm.shape[0] * sh * sw, jnp.float32))
        losses['num_gts'] = jnp.mean(
            jnp.sum(gt_valid.astype(jnp.float32), axis=1))
        return losses

    def _decode(self, outputs, **kwargs):
        """Shared decode+fast-NMS (one pipeline for boxes and masks)."""
        preds, protos, segm = outputs
        cfg = dict(self.test_cfg or {})
        nms_cfg = cfg.pop('nms', None)
        if nms_cfg is not None:
            cfg['iou_thr'] = nms_cfg.get('iou_threshold', 0.5)
        cfg.pop('min_bbox_size', None)
        cfg.pop('mask_thr', None)
        # detections are rescaled AFTER proto cropping: the prototype
        # maps live in the network-input frame, so cropping must use
        # input-frame boxes (post-rescale boxes misalign the masks)
        scale_factors = cfg.pop('scale_factors', None)
        scale_factors = kwargs.pop('scale_factors', scale_factors)
        cfg.update(kwargs)
        res, coeffs = self.bbox_head.get_bboxes(preds, **cfg)
        return res, coeffs, protos, scale_factors

    @staticmethod
    def _rescale(res, scale_factors):
        if scale_factors is None:
            return res
        return res._replace(
            bboxes=res.bboxes / scale_factors[:, None, :])

    def get_bboxes(self, outputs, **kwargs):
        res, _, _, scale_factors = self._decode(outputs, **kwargs)
        return self._rescale(res, scale_factors)

    def predict_masks(self, outputs, mask_size: int = 28, **kwargs):
        """Masks for the final detections, RoI-cropped to each box."""
        res, coeffs, protos, scale_factors = self._decode(outputs,
                                                          **kwargs)

        def one(protos_i, coeff_i, boxes_i):
            maps = jnp.einsum('hwp,kp->khw', protos_i, coeff_i)
            boxes = boxes_i / self.mask_proto_stride
            crops = jax.vmap(
                lambda m, bx: roi_align(m[..., None], bx[None],
                                        mask_size)[0, ..., 0]
            )(maps, boxes)
            return jax.nn.sigmoid(crops)

        # crop with INPUT-frame boxes, rescale the returned boxes after
        masks = jax.vmap(one)(protos, coeffs, res.bboxes)
        return self._rescale(res, scale_factors), masks
