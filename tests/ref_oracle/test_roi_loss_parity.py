"""Training-loss parity for the RoI (two-stage) world vs the LIVE
reference — the round-2 oracle suite covered dense heads only; these pin
the losses that flow through assignment + sampling + target encoding in
the RoI machinery (/root/reference/mmdet/models/roi_heads/).

Sampling randomness is removed by driving the reference with
PseudoSampler (all positives + all negatives, no subsampling) and
configuring tpudet's static sampler to keep every valid roi
(num_samples = all, pos_fraction = 1). Predictions are generated as a
deterministic function of each roi's coordinates so both sides feed the
same per-roi prediction regardless of internal roi ordering.
"""
import numpy as np
import pytest

from . import refbridge

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

NUM_CLASSES = 4
RNG = np.random.RandomState(5)

# fixed random projections: prediction rows are a pure function of the
# roi coordinates -> identical on both sides in any roi order
W_CLS = RNG.randn(4, NUM_CLASSES + 1).astype(np.float32)
W_REG = RNG.randn(4, NUM_CLASSES * 4).astype(np.float32)


def _pred_from_rois(rois):
    """rois (N, 4) xyxy -> (cls_logits (N, C+1), deltas (N, 4C))."""
    r = np.asarray(rois, np.float32) / 50.0
    return np.sin(r @ W_CLS).astype(np.float32), \
        (0.3 * np.sin(r @ W_REG)).astype(np.float32)


def _scene(n_prop=24, n_gt=3, size=200, seed=7):
    rng = np.random.RandomState(seed)
    gts = []
    for _ in range(n_gt):
        x, y = rng.rand(2) * (size - 80)
        w, h = rng.rand(2) * 60 + 20
        gts.append([x, y, x + w, y + h])
    gts = np.asarray(gts, np.float32)
    labels = rng.randint(0, NUM_CLASSES, n_gt).astype(np.int64)
    props = []
    for _ in range(n_prop):
        if rng.rand() < 0.5 and n_gt:
            g = gts[rng.randint(n_gt)]
            jit = rng.randn(4) * rng.choice([2., 8., 30.])
            b = g + jit
        else:
            x, y = rng.rand(2) * (size - 60)
            w, h = rng.rand(2) * 50 + 10
            b = np.array([x, y, x + w, y + h])
        b = np.clip(b, 0, size - 1)
        if b[2] <= b[0] + 1:
            b[2] = b[0] + 2
        if b[3] <= b[1] + 1:
            b[3] = b[1] + 2
        props.append(b)
    return np.asarray(props, np.float32), gts, labels


def _ref_bbox_head():
    models = refbridge.ref_import('mmdet.models')
    return models.build_head(dict(
        type='BBoxHead', with_avg_pool=True, in_channels=8,
        roi_feat_size=7, num_classes=NUM_CLASSES,
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[0., 0., 0., 0.],
                        target_stds=[0.1, 0.1, 0.2, 0.2]),
        reg_class_agnostic=False,
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                      loss_weight=1.0),
        loss_bbox=dict(type='L1Loss', loss_weight=1.0)))


def _ref_sample(rois_np, gts_np, labels_np,
                pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
                match_low_quality=False):
    """Reference MaxIoU assignment + PseudoSampler on one image
    (the deterministic stand-in for RandomSampler; the rcnn recipe is
    faster_rcnn_r50_fpn.py:81-95)."""
    import torch
    core = refbridge.ref_import('mmdet.core')
    assigner = core.build_assigner(dict(
        type='MaxIoUAssigner', pos_iou_thr=pos_iou_thr,
        neg_iou_thr=neg_iou_thr, min_pos_iou=min_pos_iou,
        match_low_quality=match_low_quality, ignore_iof_thr=-1))
    sampler = core.build_sampler(dict(type='PseudoSampler'))
    rois_t = torch.from_numpy(rois_np)
    gts_t = torch.from_numpy(gts_np)
    labels_t = torch.from_numpy(labels_np)
    assign = assigner.assign(rois_t, gts_t, None, labels_t)
    return sampler.sample(assign, rois_t, gts_t)


def test_standard_roi_bbox_loss_parity():
    """Faster R-CNN second stage: MaxIoU(0.5/0.5/0.5, no low-quality)
    assignment -> target encoding (stds 0.1/0.2) -> softmax CE +
    class-specific L1 with total-sample normalization
    (/root/reference/mmdet/models/roi_heads/standard_roi_head.py:188-280,
    bbox_head.py:223-268). Two images, the second with zero gts."""
    import torch
    mmcv = refbridge.ref_import('mmcv')

    props1, gts1, labels1 = _scene(seed=7)
    props2, _, _ = _scene(n_gt=0, seed=8)
    g_max = 3
    ref_head = _ref_bbox_head()
    rcnn_cfg = mmcv.Config(dict(pos_weight=-1))

    # reference: roi set per image = proposals + gts (RandomSampler's
    # add_gt_as_proposals) fed through PseudoSampler (keeps all)
    sres, all_cls, all_reg = [], [], []
    for props, gts, labels in ((props1, gts1, labels1),
                               (props2, np.zeros((0, 4), np.float32),
                                np.zeros((0,), np.int64))):
        rois = np.concatenate([props, gts], 0)
        res = _ref_sample(rois, gts, labels)
        sres.append(res)
        ordered = np.concatenate([
            refbridge.to_numpy(res.pos_bboxes).reshape(-1, 4),
            refbridge.to_numpy(res.neg_bboxes).reshape(-1, 4)], 0)
        c, r = _pred_from_rois(ordered)
        all_cls.append(c)
        all_reg.append(r)
    gt_list = [torch.from_numpy(gts1),
               torch.from_numpy(np.zeros((0, 4), np.float32))]
    label_list = [torch.from_numpy(labels1),
                  torch.from_numpy(np.zeros((0,), np.int64))]
    targets = ref_head.get_targets(sres, gt_list, label_list, rcnn_cfg)
    with torch.no_grad():
        ref_losses = ref_head.loss(
            torch.from_numpy(np.concatenate(all_cls)),
            torch.from_numpy(np.concatenate(all_reg)),
            None, *targets)
    ref_cls = float(ref_losses['loss_cls'])
    ref_bbox = float(ref_losses['loss_bbox'])

    # tpudet: same roi set (sample_rois appends the padded gts itself),
    # static sampler keeping everything
    from tpudet.models.roi_heads.standard_roi_head import StandardRoIHead
    n_prop = props1.shape[0]
    head = StandardRoIHead(num_classes=NUM_CLASSES,
                           num_samples=n_prop + g_max, pos_fraction=1.0)

    pad_props = np.stack([props1, props2])
    prop_valid = np.ones((2, n_prop), bool)
    pad_gts = np.zeros((2, g_max, 4), np.float32)
    pad_gts[0, :len(gts1)] = gts1
    pad_labels = np.zeros((2, g_max), np.int32)
    pad_labels[0, :len(labels1)] = labels1
    gt_valid = np.zeros((2, g_max), bool)
    gt_valid[0, :len(gts1)] = True

    rois, sampled, labels, targets_my, pos = head.sample_rois(
        jnp.asarray(pad_props), jnp.asarray(prop_valid),
        jnp.asarray(pad_gts), jnp.asarray(pad_labels),
        jnp.asarray(gt_valid))
    rois_np = np.asarray(rois)
    cls_rows, reg_rows = [], []
    for i in range(2):
        c, r = _pred_from_rois(rois_np[i])
        cls_rows.append(c)
        reg_rows.append(r)
    my_losses = head.loss(jnp.asarray(np.stack(cls_rows)),
                          jnp.asarray(np.stack(reg_rows)),
                          labels, targets_my, pos, sampled)

    np.testing.assert_allclose(float(my_losses['loss_cls']), ref_cls,
                               rtol=1e-4)
    np.testing.assert_allclose(float(my_losses['loss_bbox']), ref_bbox,
                               rtol=1e-4)


W_REG4 = RNG.randn(4, 4).astype(np.float32)


def _pred4(rois):
    """Class-agnostic variant (cascade heads: reg_class_agnostic=True)."""
    r = np.asarray(rois, np.float32) / 50.0
    return np.sin(r @ W_CLS).astype(np.float32), \
        (0.3 * np.sin(r @ W_REG4)).astype(np.float32)


def test_cascade_stage_losses_parity():
    """All three cascade stages vs the live reference: per-stage MaxIoU
    (0.5/0.6/0.7, match_low_quality=False), keep-all sampling with
    add_gt_as_proposals, stage-weighted CE+L1 with tightening stds, and
    the real refine path (refine_bboxes drops gt rois + clips; the next
    stage's sampler re-adds the fresh gts)
    (/root/reference/mmdet/models/roi_heads/cascade_roi_head.py:111,
    configs/_base_/models/cascade_rcnn_r50_fpn.py:120-165)."""
    import torch
    mmcv = refbridge.ref_import('mmcv')
    core = refbridge.ref_import('mmdet.core')
    models = refbridge.ref_import('mmdet.models')

    size = 200
    props1, gts1, labels1 = _scene(seed=17)
    props2, _, _ = _scene(n_gt=0, seed=18)
    g_max = 3
    n_prop = props1.shape[0]
    img_metas = [{'img_shape': (size, size, 3)}] * 2

    STAGE_IOUS = (0.5, 0.6, 0.7)
    STAGE_STDS = ((0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
                  (0.033, 0.033, 0.067, 0.067))
    STAGE_W = (1.0, 0.5, 0.25)

    ref_heads = [models.build_head(dict(
        type='BBoxHead', with_avg_pool=True, in_channels=8,
        roi_feat_size=7, num_classes=NUM_CLASSES,
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[0., 0., 0., 0.],
                        target_stds=list(stds)),
        reg_class_agnostic=True,
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                      loss_weight=1.0),
        loss_bbox=dict(type='SmoothL1Loss', beta=1.0, loss_weight=1.0)))
        for stds in STAGE_STDS]
    rcnn_cfg = mmcv.Config(dict(pos_weight=-1))

    gt_list = [torch.from_numpy(gts1),
               torch.from_numpy(np.zeros((0, 4), np.float32))]
    label_list = [torch.from_numpy(labels1),
                  torch.from_numpy(np.zeros((0,), np.int64))]
    proposal_list = [torch.from_numpy(props1), torch.from_numpy(props2)]

    ref_stage_losses = []
    for stage, thr in enumerate(STAGE_IOUS):
        assigner = core.build_assigner(dict(
            type='MaxIoUAssigner', pos_iou_thr=thr, neg_iou_thr=thr,
            min_pos_iou=thr, match_low_quality=False, ignore_iof_thr=-1))
        # RandomSampler with num >= all candidates keeps everything
        # deterministically AND sets pos_is_gt / re-adds gts like the
        # shipped config (num=512 merely subsamples)
        sampler = core.build_sampler(dict(
            type='RandomSampler', num=4096, pos_fraction=0.5,
            neg_pos_ub=-1, add_gt_as_proposals=True))
        sres = []
        for j in range(2):
            assign = assigner.assign(proposal_list[j], gt_list[j], None,
                                     label_list[j])
            sres.append(sampler.sample(assign, proposal_list[j],
                                       gt_list[j],
                                       gt_labels=label_list[j]))
        all_cls, all_reg = [], []
        for res in sres:
            ordered = np.concatenate([
                refbridge.to_numpy(res.pos_bboxes).reshape(-1, 4),
                refbridge.to_numpy(res.neg_bboxes).reshape(-1, 4)], 0)
            c, r = _pred4(ordered)
            all_cls.append(c)
            all_reg.append(r)
        targets = ref_heads[stage].get_targets(sres, gt_list, label_list,
                                               rcnn_cfg)
        cls_t = torch.from_numpy(np.concatenate(all_cls))
        reg_t = torch.from_numpy(np.concatenate(all_reg))
        with torch.no_grad():
            ls = ref_heads[stage].loss(cls_t, reg_t, None, *targets)
        ref_stage_losses.append((float(ls['loss_cls']) * STAGE_W[stage],
                                 float(ls['loss_bbox']) * STAGE_W[stage]))
        if stage < 2:
            rois_t = core.bbox2roi([res.bboxes for res in sres])
            with torch.no_grad():
                proposal_list = ref_heads[stage].refine_bboxes(
                    rois_t, targets[0], reg_t,
                    [res.pos_is_gt for res in sres], img_metas)

    # ---- tpudet: same roi flow through CascadeRoIHead's static methods
    from tpudet.models.roi_heads.cascade_roi_head import CascadeRoIHead
    head = CascadeRoIHead(num_classes=NUM_CLASSES,
                          num_samples=n_prop + g_max, pos_fraction=1.0)
    pad_props = np.stack([props1, props2])
    prop_valid = np.ones((2, n_prop), bool)
    pad_gts = np.zeros((2, g_max, 4), np.float32)
    pad_gts[0, :len(gts1)] = gts1
    pad_labels = np.zeros((2, g_max), np.int32)
    pad_labels[0, :len(labels1)] = labels1
    gt_valid = np.zeros((2, g_max), bool)
    gt_valid[0, :len(gts1)] = True

    rois, sampled0, labels0, targets0, pos0, is_gt = head.sample_rois(
        jnp.asarray(pad_props), jnp.asarray(prop_valid),
        jnp.asarray(pad_gts), jnp.asarray(pad_labels),
        jnp.asarray(gt_valid), return_is_gt=True)
    roi_valid = sampled0
    for stage in range(3):
        rois_np = np.asarray(rois)
        cls_rows = np.stack([_pred4(rois_np[i])[0] for i in range(2)])
        reg_rows = np.stack([_pred4(rois_np[i])[1] for i in range(2)])
        if stage == 0:
            sampled, st_labels, st_targets, st_pos = (
                sampled0, labels0, targets0, pos0)
        else:
            sampled, st_labels, st_targets, st_pos = head.stage_targets(
                stage, rois, roi_valid, jnp.asarray(pad_gts),
                jnp.asarray(pad_labels), jnp.asarray(gt_valid))
        my = head.loss(jnp.asarray(cls_rows), jnp.asarray(reg_rows),
                       st_labels, st_targets, st_pos, sampled)
        ref_cls, ref_bbox = ref_stage_losses[stage]
        np.testing.assert_allclose(
            float(my['loss_cls']) * STAGE_W[stage], ref_cls, rtol=1e-4,
            err_msg=f'stage {stage} cls')
        np.testing.assert_allclose(
            float(my['loss_bbox']) * STAGE_W[stage], ref_bbox, rtol=1e-4,
            err_msg=f'stage {stage} bbox')
        if stage < 2:
            refined = head.refine(stage, rois, jnp.asarray(reg_rows),
                                  (size, size))
            rois = jnp.where(is_gt[..., None], rois, refined)


def _mask_pred_from_rois(rois, out=28, nc=NUM_CLASSES, seed=21):
    """Per-roi 28x28xC mask logits as a pure function of roi coords."""
    rng = np.random.RandomState(seed)
    w = rng.randn(4, out * out * nc).astype(np.float32)
    r = np.asarray(rois, np.float32) / 50.0
    return (0.5 * np.sin(r @ w)).reshape(-1, out, out, nc).astype(
        np.float32)


def test_mask_loss_parity():
    """Mask R-CNN mask branch: matched-class channel BCE over positive
    rois, mean over n_pos*28^2 (reference fcn_mask_head.py:134-170 +
    mask_target.py). Full-box masks give resampling-free exact targets;
    half-box masks additionally pin the target crop geometry."""
    import torch
    mmcv = refbridge.ref_import('mmcv')
    models = refbridge.ref_import('mmdet.models')
    structures = refbridge.ref_import('mmdet.core.mask.structures')

    size = 224
    # integer-coordinate gt boxes, widths/heights multiples of 56 so the
    # 28-point sample grid lands at pixel centers on both sides
    gts = np.array([[16., 16., 72., 128.],      # 56 x 112
                    [96., 32., 208., 88.],      # 112 x 56
                    [32., 144., 88., 200.]], np.float32)   # 56 x 56
    labels = np.array([0, 2, 1], np.int64)
    # masks: full box, left-half box, top-half box
    bitmap = np.zeros((3, size, size), np.uint8)
    bitmap[0, 16:128, 16:72] = 1
    bitmap[1, 32:88, 96:152] = 1      # left half of gt 1
    bitmap[2, 144:172, 32:88] = 1     # top half of gt 2
    gt_masks = structures.BitmapMasks(bitmap, size, size)

    # rois = the gt boxes themselves (deterministic positives)
    rois = gts.copy()
    mask_pred = _mask_pred_from_rois(rois)

    ref_head = models.build_head(dict(
        type='FCNMaskHead', num_convs=0, in_channels=8,
        conv_out_channels=8, num_classes=NUM_CLASSES,
        loss_mask=dict(type='CrossEntropyLoss', use_mask=True,
                       loss_weight=1.0)))
    res = _ref_sample(rois, gts, labels)
    targets = ref_head.get_targets([res], [gt_masks],
                                   mmcv.Config(dict(mask_size=28)))
    # order: pos rois in sampling order; predictions keyed by roi coords
    pos_rois = refbridge.to_numpy(res.pos_bboxes)
    pos_pred = _mask_pred_from_rois(pos_rois)
    pos_labels = refbridge.to_numpy(res.pos_gt_labels)
    with torch.no_grad():
        ref_loss = float(ref_head.loss(
            torch.from_numpy(np.transpose(pos_pred, (0, 3, 1, 2))),
            targets, torch.from_numpy(pos_labels))['loss_mask'])

    # ---- tpudet
    from tpudet.models.roi_heads.mask_head import MaskRoIHead
    head = MaskRoIHead(num_classes=NUM_CLASSES)
    s_frame = 56
    gfm = np.zeros((3, s_frame, s_frame), np.float32)
    gfm[0] = 1.0                      # full box
    gfm[1, :, :s_frame // 2] = 1.0    # left half
    gfm[2, :s_frame // 2, :] = 1.0    # top half
    my_loss = head.mask_loss(
        jnp.asarray(_mask_pred_from_rois(rois)[None]),
        jnp.asarray(rois[None]),
        jnp.ones((1, 3), bool),
        jnp.arange(3, dtype=jnp.int32)[None],
        jnp.asarray(gts[None]),
        jnp.asarray(gfm[None]),
        jnp.asarray(labels[None].astype(np.int32)))
    np.testing.assert_allclose(float(my_loss['loss_mask']), ref_loss,
                               rtol=1e-3)


def test_deformable_detr_loss_parity():
    """Deformable-DETR per-decoder-layer losses vs the live reference
    (deformable_detr_head.py:183-255 -> DETRHead.loss_single): Hungarian
    matching with FocalLossCost(2.0)/BBoxL1Cost(5.0)/GIoUCost(2.0) on
    normalized cxcywh boxes, sigmoid focal cls over num_pos, L1(5.0) and
    GIoU(2.0) over num_pos."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    mmcv = refbridge.ref_import('mmcv')
    rng = np.random.RandomState(13)
    s_img = 128
    Q = 20

    ref = heads.DeformableDETRHead(
        num_classes=NUM_CLASSES, in_channels=16, num_query=Q,
        transformer=dict(
            type='DeformableDetrTransformer',
            encoder=dict(
                type='DetrTransformerEncoder', num_layers=1,
                transformerlayers=dict(
                    type='BaseTransformerLayer',
                    attn_cfgs=dict(type='MultiScaleDeformableAttention',
                                   embed_dims=32, num_levels=4,
                                   num_heads=2),
                    feedforward_channels=64, ffn_dropout=0.1,
                    operation_order=('self_attn', 'norm', 'ffn', 'norm'))),
            decoder=dict(
                type='DeformableDetrTransformerDecoder',
                return_intermediate=True, num_layers=2,
                transformerlayers=dict(
                    type='DetrTransformerDecoderLayer',
                    attn_cfgs=[
                        dict(type='MultiheadAttention', embed_dims=32,
                             num_heads=2),
                        dict(type='MultiScaleDeformableAttention',
                             embed_dims=32, num_levels=4, num_heads=2)],
                    feedforward_channels=64, ffn_dropout=0.1,
                    operation_order=('self_attn', 'norm', 'cross_attn',
                                     'norm', 'ffn', 'norm')))),
        positional_encoding=dict(type='SinePositionalEncoding',
                                 num_feats=16, normalize=True,
                                 offset=-0.5),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=2.0),
        loss_bbox=dict(type='L1Loss', loss_weight=5.0),
        loss_iou=dict(type='GIoULoss', loss_weight=2.0),
        train_cfg=mmcv.Config(dict(assigner=dict(
            type='HungarianAssigner',
            cls_cost=dict(type='FocalLossCost', weight=2.0),
            reg_cost=dict(type='BBoxL1Cost', weight=5.0,
                          box_format='xywh'),
            iou_cost=dict(type='IoUCost', iou_mode='giou', weight=2.0)))))
    ref.requires_grad_(False)

    Ldec = 2
    cls_all = rng.randn(Ldec, 2, Q, NUM_CLASSES).astype(np.float32)
    bbox_all = (1.0 / (1.0 + np.exp(-rng.randn(Ldec, 2, Q, 4)))).astype(
        np.float32)
    boxes = []
    for _ in range(3):
        x, y = rng.rand(2) * 60
        w, h = rng.rand(2) * 50 + 12
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = rng.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            torch.from_numpy(cls_all), torch.from_numpy(bbox_all),
            None, None,
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)

    from tpudet.models.dense_heads.deformable_detr_head import \
        DeformableDETRHead
    head = DeformableDETRHead(num_classes=NUM_CLASSES, num_query=Q)
    G = 4
    pad_boxes = np.zeros((2, G, 4), np.float32)
    pad_boxes[0, :3] = gt_boxes
    pad_boxes[1, :2] = gt_boxes[:2]
    pad_labels = np.zeros((2, G), np.int32)
    pad_labels[0, :3] = gt_labels
    pad_labels[1, :2] = gt_labels[:2]
    valid = np.zeros((2, G), bool)
    valid[0, :3] = True
    valid[1, :2] = True
    factor = jnp.asarray([s_img, s_img, s_img, s_img], jnp.float32)
    mine = head.loss(
        (jnp.asarray(cls_all), jnp.asarray(bbox_all), factor),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels),
        jnp.asarray(valid))

    for lyr in range(Ldec):
        pfx = '' if lyr == Ldec - 1 else f'd{lyr}.'
        for key in ('loss_cls', 'loss_bbox', 'loss_iou'):
            np.testing.assert_allclose(
                float(mine[f'{pfx}{key}']),
                float(ref_losses[f'{pfx}{key}']), rtol=1e-4,
                err_msg=f'{pfx}{key}')


def test_yolact_head_loss_parity():
    """YOLACT anchor-head losses vs the live reference (yolact_head.py:
    138-292): MaxIoU(0.5/0.4/0) assignment, per-image OHEM (pos + 3x
    hardest negatives; an image with no positives takes ALL negatives),
    softmax CE and SmoothL1(1.5x) both normalized by batch num_pos."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    mmcv = refbridge.ref_import('mmcv')
    rng = np.random.RandomState(23)
    s_img = 128
    strides = (8, 16, 32)
    A = 3

    ref = heads.YOLACTHead(
        num_classes=NUM_CLASSES, in_channels=8, feat_channels=16,
        num_head_convs=1, num_protos=6, use_ohem=True,
        anchor_generator=dict(type='AnchorGenerator', octave_base_scale=3,
                              scales_per_octave=1, ratios=[0.5, 1.0, 2.0],
                              strides=list(strides)),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[0., 0., 0., 0.],
                        target_stds=[0.1, 0.1, 0.2, 0.2]),
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                      reduction='none', loss_weight=1.0),
        loss_bbox=dict(type='SmoothL1Loss', beta=1.0, loss_weight=1.5),
        train_cfg=mmcv.Config(dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.4, min_pos_iou=0.,
                          ignore_iof_thr=-1, gt_max_assign_all=False),
            allowed_border=-1, pos_weight=-1, neg_pos_ratio=3,
            debug=False)))
    ref.requires_grad_(False)

    cls_maps = [rng.randn(2, A * (NUM_CLASSES + 1), s_img // s,
                          s_img // s).astype(np.float32)
                for s in strides]
    bbox_maps = [rng.randn(2, A * 4, s_img // s,
                           s_img // s).astype(np.float32) * 0.3
                 for s in strides]
    boxes = []
    for _ in range(3):
        x, y = rng.rand(2) * 60
        w, h = rng.rand(2) * 50 + 12
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = rng.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses, _ = ref.loss(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in bbox_maps],
            [torch.from_numpy(gt_boxes),
             torch.from_numpy(np.zeros((0, 4), np.float32))],
            [torch.from_numpy(gt_labels),
             torch.from_numpy(np.zeros((0,), np.int64))],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_cls = sum(float(v) for v in ref_losses['loss_cls'])
    ref_bbox = sum(float(v) for v in ref_losses['loss_bbox'])

    from tpudet.models.dense_heads.yolact_head import YOLACTHead
    head = YOLACTHead(num_classes=NUM_CLASSES, strides=strides)
    G = 4
    pad_boxes = np.zeros((2, G, 4), np.float32)
    pad_boxes[0, :3] = gt_boxes
    pad_labels = np.zeros((2, G), np.int32)
    pad_labels[0, :3] = gt_labels
    valid = np.zeros((2, G), bool)
    valid[0, :3] = True
    # tpudet flatten convention: (B, H, W, A*(C+1)) per level
    cls_nhwc = tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
                     for m in cls_maps)
    box_nhwc = tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
                     for m in bbox_maps)
    coeff_nhwc = tuple(jnp.zeros(c.shape[:3] + (A * 6,)) for c in cls_nhwc)
    mine = head.loss((cls_nhwc, box_nhwc, coeff_nhwc),
                     jnp.asarray(pad_boxes), jnp.asarray(pad_labels),
                     jnp.asarray(valid))
    np.testing.assert_allclose(float(mine['loss_cls']), ref_cls, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_bbox']), ref_bbox,
                               rtol=1e-4)


def test_ssd_empty_image_ohem_parity():
    """SSD OHEM with an empty-gt image in the batch: the reference takes
    ALL negatives of that image (ssd_head.py loss_single) and normalizes
    by sum(max(num_pos_img, 1)) — both quirks pinned here (the main SSD
    parity test covers the non-empty case)."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    mmcv = refbridge.ref_import('mmcv')
    rng = np.random.RandomState(31)
    s_img = 300

    ref = heads.SSDHead(
        num_classes=NUM_CLASSES, in_channels=(8, 8, 8, 8, 8, 8),
        anchor_generator=dict(
            type='SSDAnchorGenerator', scale_major=False, input_size=300,
            basesize_ratio_range=(0.15, 0.9),
            strides=[8, 16, 32, 64, 100, 300],
            ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]]),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[.0, .0, .0, .0],
                        target_stds=[0.1, 0.1, 0.2, 0.2]),
        train_cfg=mmcv.Config(dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.5, min_pos_iou=0.,
                          ignore_iof_thr=-1, gt_max_assign_all=False),
            smoothl1_beta=1., allowed_border=-1, pos_weight=-1,
            neg_pos_ratio=3, debug=False)))
    ref.requires_grad_(False)

    feat_sizes = (38, 19, 10, 5, 3, 1)
    num_anchors = (4, 6, 6, 6, 4, 4)
    cls_maps = [rng.randn(2, a * (NUM_CLASSES + 1), f, f).astype(np.float32)
                for a, f in zip(num_anchors, feat_sizes)]
    reg_maps = [(rng.randn(2, a * 4, f, f) * 0.3).astype(np.float32)
                for a, f in zip(num_anchors, feat_sizes)]
    boxes = []
    for _ in range(3):
        x, y = rng.rand(2) * 150
        w, h = rng.rand(2) * 120 + 30
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = rng.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in reg_maps],
            [torch.from_numpy(gt_boxes),
             torch.from_numpy(np.zeros((0, 4), np.float32))],
            [torch.from_numpy(gt_labels),
             torch.from_numpy(np.zeros((0,), np.int64))],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_cls = sum(float(v) for v in ref_losses['loss_cls'])
    ref_bbox = sum(float(v) for v in ref_losses['loss_bbox'])

    from tpudet.models.dense_heads.ssd_head import SSDHead
    head = SSDHead(num_classes=NUM_CLASSES)
    G = 4
    pad_boxes = np.zeros((2, G, 4), np.float32)
    pad_boxes[0, :3] = gt_boxes
    pad_labels = np.zeros((2, G), np.int32)
    pad_labels[0, :3] = gt_labels
    valid = np.zeros((2, G), bool)
    valid[0, :3] = True
    mine = head.loss(
        (tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in cls_maps),
         tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in reg_maps)),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels),
        jnp.asarray(valid))
    np.testing.assert_allclose(float(mine['loss_cls']), ref_cls, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_bbox']), ref_bbox,
                               rtol=1e-4)
