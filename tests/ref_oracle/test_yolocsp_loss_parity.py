"""Full training-loss parity for the FLAGSHIP fork head: tpudet's
YOLOCSPHead.loss (dense padded targets, scatter-max conf) vs the LIVE
reference yolocsp_head.py::loss (responsible_indices + index-list
targets) on random prediction maps and synthetic ground truth — the
numbers that drive every yolov4/yolov5 gradient step.
"""
import numpy as np
import pytest

from . import refbridge

jnp = pytest.importorskip('jax.numpy')

S = 320
STRIDES = (8, 16, 32)
NUM_CLASSES = 4
A = 3
RNG = np.random.RandomState(11)


def _gts():
    """Two images: 3 gts and 0 gts (the standard empty-image case)."""
    boxes = []
    for _ in range(3):
        x, y = RNG.rand(2) * 200
        w, h = RNG.rand(2) * 150 + 20
        boxes.append([x, y, min(x + w, S - 1), min(y + h, S - 1)])
    return np.array(boxes, np.float32), RNG.randint(
        0, NUM_CLASSES, size=3).astype(np.int64)


def test_yolocsp_loss_matches_reference():
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    ref = heads.YOLOCSPHead(num_classes=NUM_CLASSES,
                            in_channels=[8, 8, 8])
    ref.requires_grad_(False)

    attrib = 5 + NUM_CLASSES
    pred_maps = [
        (RNG.randn(2, A * attrib, S // s, S // s)).astype(np.float32)
        for s in STRIDES
    ]
    gt_boxes, gt_labels = _gts()

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in pred_maps],
            [torch.from_numpy(gt_boxes),
             torch.from_numpy(np.zeros((0, 4), np.float32))],
            [torch.from_numpy(gt_labels),
             torch.from_numpy(np.zeros((0,), np.int64))],
            img_metas=[{'img_shape': (S, S, 3)}] * 2)
    ref_cls = sum(float(v) for v in ref_losses['loss_cls'])
    ref_conf = sum(float(v) for v in ref_losses['loss_conf'])
    ref_bbox = sum(float(v) for v in ref_losses['loss_bbox'])

    from tpudet.models.dense_heads.yolocsp_head import YOLOCSPHead
    head = YOLOCSPHead(num_classes=NUM_CLASSES, in_channels=[8, 8, 8])
    G = 4
    pad_boxes = np.zeros((2, G, 4), np.float32)
    pad_boxes[0, :3] = gt_boxes
    pad_labels = np.zeros((2, G), np.int32)
    pad_labels[0, :3] = gt_labels
    valid = np.zeros((2, G), bool)
    valid[0, :3] = True
    mine = head.loss(
        tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
              for m in pred_maps),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels),
        jnp.asarray(valid))

    np.testing.assert_allclose(float(mine['loss_bbox']), ref_bbox,
                               rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_cls']), ref_cls, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_conf']), ref_conf,
                               rtol=1e-4)
    np.testing.assert_allclose(float(mine['num_gts']), 1.5)


def test_retina_loss_matches_reference():
    """Generic anchor-head training glue (reference anchor_head.py::loss
    with RetinaHead: MaxIoU assignment, PseudoSampler, focal cls with
    num_total_pos normalization, L1 on encoded deltas)."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    s_img = 128
    strides = (8, 16, 32, 64, 128)
    ref = heads.RetinaHead(
        num_classes=NUM_CLASSES, in_channels=8, feat_channels=32,
        stacked_convs=1,
        anchor_generator=dict(type='AnchorGenerator', octave_base_scale=4,
                              scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                              strides=list(strides)),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder', target_means=[0.0] * 4,
                        target_stds=[1.0] * 4),
        # the retinanet config's losses (AnchorHead defaults to CE +
        # sampling, which is NOT the RetinaNet recipe)
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='L1Loss', loss_weight=1.0),
        train_cfg=refbridge.ref_import('mmcv').Config(dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.4, min_pos_iou=0,
                          ignore_iof_thr=-1),
            allowed_border=-1, pos_weight=-1, debug=False)))
    ref.requires_grad_(False)

    cls_maps = [
        (RNG.randn(2, 9 * NUM_CLASSES, s_img // s, s_img // s)).astype(
            np.float32) for s in strides
    ]
    reg_maps = [
        (RNG.randn(2, 36, s_img // s, s_img // s) * 0.3).astype(np.float32)
        for s in strides
    ]
    boxes = []
    for _ in range(3):
        x, y = RNG.rand(2) * 80
        w, h = RNG.rand(2) * 40 + 10
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in reg_maps],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_cls = sum(float(v) for v in ref_losses['loss_cls'])
    ref_bbox = sum(float(v) for v in ref_losses['loss_bbox'])

    from tpudet.models.dense_heads.retina_head import RetinaHead
    head = RetinaHead(num_classes=NUM_CLASSES, in_channels=8)
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
    mine = head.loss(
        (tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in cls_maps),
         tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in reg_maps)),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels), jnp.asarray(valid))
    np.testing.assert_allclose(float(mine['loss_cls']), ref_cls, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_bbox']), ref_bbox,
                               rtol=1e-4)


def test_fcos_loss_matches_reference():
    """FCOS training loss (reference fcos_head.py::loss: regress-range
    point assignment, min-area tie-break, IoU loss weighted by centerness
    targets, BCE centerness) — fully deterministic, no sampling."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    s_img = 128
    strides = (8, 16, 32, 64, 128)
    ref = heads.FCOSHead(
        num_classes=NUM_CLASSES, in_channels=8, feat_channels=32,
        stacked_convs=1, strides=list(strides),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='IoULoss', loss_weight=1.0),
        loss_centerness=dict(type='CrossEntropyLoss', use_sigmoid=True,
                             loss_weight=1.0))
    ref.requires_grad_(False)
    cls_maps = [
        (RNG.randn(2, NUM_CLASSES, s_img // s, s_img // s)).astype(
            np.float32) for s in strides
    ]
    reg_maps = [
        np.abs(RNG.randn(2, 4, s_img // s, s_img // s) * 8).astype(
            np.float32) for s in strides
    ]
    ctr_maps = [
        (RNG.randn(2, 1, s_img // s, s_img // s)).astype(np.float32)
        for s in strides
    ]
    boxes = []
    for _ in range(3):
        x, y = RNG.rand(2) * 60
        w, h = RNG.rand(2) * 50 + 12
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        # reference FCOS loss exp()s the raw reg map inside forward — it
        # receives distances directly in loss(), already positive here
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in reg_maps],
            [torch.from_numpy(m) for m in ctr_maps],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3)}] * 2)
    ref_cls = float(ref_losses['loss_cls'])
    ref_bbox = float(ref_losses['loss_bbox'])
    ref_ctr = float(ref_losses['loss_centerness'])

    from tpudet.models.dense_heads.fcos_head import FCOSHead
    head = FCOSHead(num_classes=NUM_CLASSES, in_channels=8)
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
    mine = head.loss(
        (tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in cls_maps),
         tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in reg_maps),
         tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in ctr_maps)),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels), jnp.asarray(valid))
    np.testing.assert_allclose(float(mine['loss_cls']), ref_cls, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_bbox']), ref_bbox,
                               rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_centerness']), ref_ctr,
                               rtol=1e-4)


def test_gfl_loss_matches_reference():
    """GFL training loss (reference gfl_head.py::loss: ATSS assignment,
    QFL with decoded-IoU quality targets, DFL on integral bins, GIoU
    weighted by the predicted max-score and normalized by its sum)."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    s_img = 128
    strides = (8, 16, 32, 64, 128)
    reg_max = 16
    ref = heads.GFLHead(
        num_classes=NUM_CLASSES, in_channels=8, feat_channels=32,
        stacked_convs=1, reg_max=reg_max,
        anchor_generator=dict(type='AnchorGenerator', ratios=[1.0],
                              octave_base_scale=8, scales_per_octave=1,
                              strides=list(strides)),
        loss_cls=dict(type='QualityFocalLoss', use_sigmoid=True, beta=2.0,
                      loss_weight=1.0),
        loss_dfl=dict(type='DistributionFocalLoss', loss_weight=0.25),
        loss_bbox=dict(type='GIoULoss', loss_weight=2.0),
        train_cfg=refbridge.ref_import('mmcv').Config(dict(
            assigner=dict(type='ATSSAssigner', topk=9),
            allowed_border=-1, pos_weight=-1, debug=False)))
    ref.requires_grad_(False)
    cls_maps = [
        (RNG.randn(2, NUM_CLASSES, s_img // s, s_img // s)).astype(
            np.float32) for s in strides
    ]
    reg_maps = [
        (RNG.randn(2, 4 * (reg_max + 1), s_img // s, s_img // s)).astype(
            np.float32) for s in strides
    ]
    boxes = []
    for _ in range(3):
        x, y = RNG.rand(2) * 60
        w, h = RNG.rand(2) * 50 + 12
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in reg_maps],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_cls = sum(float(v) for v in ref_losses['loss_cls'])
    ref_bbox = sum(float(v) for v in ref_losses['loss_bbox'])
    ref_dfl = sum(float(v) for v in ref_losses['loss_dfl'])

    from tpudet.models.dense_heads.gfl_head import GFLHead
    head = GFLHead(num_classes=NUM_CLASSES, in_channels=8, reg_max=reg_max)
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
    mine = head.loss(
        (tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in cls_maps),
         tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in reg_maps)),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels), jnp.asarray(valid))
    np.testing.assert_allclose(float(mine['loss_cls']), ref_cls, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_bbox']), ref_bbox,
                               rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_dfl']), ref_dfl, rtol=1e-4)


def test_atss_loss_matches_reference():
    """ATSS training loss (reference atss_head.py::loss: ATSS assignment,
    focal cls over num_total_pos, GIoU on DeltaXYWH-decoded boxes
    weighted by centerness targets and normalized by their clamped sum,
    BCE centerness)."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    s_img = 128
    strides = (8, 16, 32, 64, 128)
    ref = heads.ATSSHead(
        num_classes=NUM_CLASSES, in_channels=8, feat_channels=32,
        stacked_convs=1,
        anchor_generator=dict(type='AnchorGenerator', ratios=[1.0],
                              octave_base_scale=8, scales_per_octave=1,
                              strides=list(strides)),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder', target_means=[0.0] * 4,
                        target_stds=[0.1, 0.1, 0.2, 0.2]),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='GIoULoss', loss_weight=2.0),
        loss_centerness=dict(type='CrossEntropyLoss', use_sigmoid=True,
                             loss_weight=1.0),
        train_cfg=refbridge.ref_import('mmcv').Config(dict(
            assigner=dict(type='ATSSAssigner', topk=9),
            allowed_border=-1, pos_weight=-1, debug=False)))
    ref.requires_grad_(False)
    cls_maps = [
        (RNG.randn(2, NUM_CLASSES, s_img // s, s_img // s)).astype(
            np.float32) for s in strides
    ]
    reg_maps = [
        (RNG.randn(2, 4, s_img // s, s_img // s) * 0.5).astype(np.float32)
        for s in strides
    ]
    ctr_maps = [
        (RNG.randn(2, 1, s_img // s, s_img // s)).astype(np.float32)
        for s in strides
    ]
    boxes = []
    for _ in range(3):
        x, y = RNG.rand(2) * 60
        w, h = RNG.rand(2) * 50 + 12
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in reg_maps],
            [torch.from_numpy(m) for m in ctr_maps],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_cls = sum(float(v) for v in ref_losses['loss_cls'])
    ref_bbox = sum(float(v) for v in ref_losses['loss_bbox'])
    ref_ctr = sum(float(v) for v in ref_losses['loss_centerness'])

    from tpudet.models.dense_heads.atss_head import ATSSHead
    head = ATSSHead(num_classes=NUM_CLASSES, in_channels=8)
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
    mine = head.loss(
        (tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in cls_maps),
         tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in reg_maps),
         tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in ctr_maps)),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels), jnp.asarray(valid))
    np.testing.assert_allclose(float(mine['loss_cls']), ref_cls, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_bbox']), ref_bbox,
                               rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_centerness']), ref_ctr,
                               rtol=1e-4)


def test_yolov3_loss_matches_reference():
    """YOLOv3 training loss (reference yolo_head.py::loss: GridAssigner
    responsible-cell targets, CE conf/cls/xy with negative-map masking,
    MSE wh) — the upstream YOLO family's gradient step."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    mmcv = refbridge.ref_import('mmcv')
    s_img = 320
    ref = heads.YOLOV3Head(
        num_classes=NUM_CLASSES, in_channels=[8, 8, 8],
        out_channels=[16, 16, 16],
        # the published recipe's losses (yolov3_d53_mstrain-608: all
        # reduction='sum', weights 1/1/2/2)
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,
                      loss_weight=1.0, reduction='sum'),
        loss_conf=dict(type='CrossEntropyLoss', use_sigmoid=True,
                       loss_weight=1.0, reduction='sum'),
        loss_xy=dict(type='CrossEntropyLoss', use_sigmoid=True,
                     loss_weight=2.0, reduction='sum'),
        loss_wh=dict(type='MSELoss', loss_weight=2.0, reduction='sum'),
        train_cfg=mmcv.Config(dict(
            assigner=dict(type='GridAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.5, min_pos_iou=0))))
    ref.requires_grad_(False)
    attrib = 5 + NUM_CLASSES
    pred_maps = [
        (RNG.randn(2, 3 * attrib, s_img // s, s_img // s)).astype(
            np.float32) for s in (32, 16, 8)
    ]
    boxes = []
    for _ in range(3):
        x, y = RNG.rand(2) * 200
        w, h = RNG.rand(2) * 100 + 16
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in pred_maps],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_vals = {k: sum(float(v) for v in vs)
                for k, vs in ref_losses.items()}

    from tpudet.models.dense_heads.yolov3_head import YOLOV3Head
    head = YOLOV3Head(num_classes=NUM_CLASSES)
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
    mine = head.loss(
        tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
              for m in pred_maps),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels), jnp.asarray(valid))
    for key in ('loss_cls', 'loss_conf', 'loss_xy', 'loss_wh'):
        np.testing.assert_allclose(float(mine[key]), ref_vals[key],
                                   rtol=1e-4, err_msg=key)


def test_fsaf_loss_matches_reference():
    """FSAF training loss (reference fsaf_head.py::loss: CenterRegion
    assignment with min_pos_iof + smallest-area contest + same-class
    shadow override, elementwise focal/IoU, online level selection,
    post-selection num_pos normalization)."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    mmcv = refbridge.ref_import('mmcv')
    s_img = 128
    strides = (8, 16, 32, 64, 128)
    ref = heads.FSAFHead(
        num_classes=NUM_CLASSES, in_channels=8, feat_channels=32,
        stacked_convs=1, reg_decoded_bbox=True,
        anchor_generator=dict(type='AnchorGenerator', octave_base_scale=1,
                              scales_per_octave=1, ratios=[1.0],
                              strides=list(strides)),
        bbox_coder=dict(type='TBLRBBoxCoder', normalizer=4.0),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0, reduction='none'),
        loss_bbox=dict(type='IoULoss', eps=1e-6, loss_weight=1.0,
                       reduction='none'),
        train_cfg=mmcv.Config(dict(
            assigner=dict(type='CenterRegionAssigner', pos_scale=0.2,
                          neg_scale=0.2, min_pos_iof=0.01),
            allowed_border=-1, pos_weight=-1, debug=False)))
    ref.requires_grad_(False)
    cls_maps = [
        (RNG.randn(2, NUM_CLASSES, s_img // s, s_img // s)).astype(
            np.float32) for s in strides
    ]
    reg_maps = [
        (RNG.randn(2, 4, s_img // s, s_img // s) * 2).astype(np.float32)
        for s in strides
    ]
    boxes = []
    for _ in range(3):
        x, y = RNG.rand(2) * 50
        w, h = RNG.rand(2) * 60 + 16
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in reg_maps],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_cls = sum(float(v) for v in ref_losses['loss_cls'])
    ref_bbox = sum(float(v) for v in ref_losses['loss_bbox'])
    ref_num_pos = float(ref_losses['num_pos'])

    from tpudet.models.dense_heads.fsaf_head import FSAFHead
    head = FSAFHead(num_classes=NUM_CLASSES, in_channels=8)
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
    mine = head.loss(
        (tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in cls_maps),
         tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in reg_maps)),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels), jnp.asarray(valid))
    np.testing.assert_allclose(float(mine['num_pos']), ref_num_pos)
    np.testing.assert_allclose(float(mine['loss_cls']), ref_cls, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_bbox']), ref_bbox,
                               rtol=1e-4)


def test_fovea_loss_matches_reference():
    """FoveaBox training loss (reference fovea_head.py::loss: sqrt-area
    scale assignment, sigma-shrunk fovea painting with smallest-area-wins
    overwrite order, log-space base_edge targets clamped to [1/16,16],
    focal over num_pos+num_imgs, smooth-L1(beta .11, weight .75) over
    num_pos) — published recipe hyperparameters."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    s_img = 128
    strides = (8, 16, 32, 64, 128)
    scale_ranges = ((1, 64), (32, 128), (64, 256), (128, 512), (256, 2048))
    ref = heads.FoveaHead(
        num_classes=NUM_CLASSES, in_channels=8, feat_channels=32,
        stacked_convs=1, strides=list(strides),
        base_edge_list=[16, 32, 64, 128, 256], scale_ranges=scale_ranges,
        sigma=0.4,
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=1.5,
                      alpha=0.4, loss_weight=1.0),
        loss_bbox=dict(type='SmoothL1Loss', beta=0.11, loss_weight=0.75))
    ref.requires_grad_(False)
    cls_maps = [
        (RNG.randn(2, NUM_CLASSES, s_img // s, s_img // s)).astype(
            np.float32) for s in strides
    ]
    reg_maps = [
        (RNG.randn(2, 4, s_img // s, s_img // s)).astype(np.float32)
        for s in strides
    ]
    boxes = []
    for _ in range(4):
        x, y = RNG.rand(2) * 50
        w, h = RNG.rand(2) * 70 + 12
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=4).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in reg_maps],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_cls = float(ref_losses['loss_cls'])
    ref_bbox = float(ref_losses['loss_bbox'])

    from tpudet.models.dense_heads.fovea_head import FoveaHead
    head = FoveaHead(num_classes=NUM_CLASSES, in_channels=8,
                     scale_ranges=scale_ranges, focal_gamma=1.5,
                     focal_alpha=0.4, smooth_l1_beta=0.11,
                     loss_bbox_weight=0.75)
    G = 5
    pad_boxes = np.zeros((2, G, 4), np.float32)
    pad_boxes[0, :4] = gt_boxes
    pad_boxes[1, :2] = gt_boxes[:2]
    pad_labels = np.zeros((2, G), np.int32)
    pad_labels[0, :4] = gt_labels
    pad_labels[1, :2] = gt_labels[:2]
    valid = np.zeros((2, G), bool)
    valid[0, :4] = True
    valid[1, :2] = True
    mine = head.loss(
        (tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in cls_maps),
         tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in reg_maps)),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels), jnp.asarray(valid))
    np.testing.assert_allclose(float(mine['loss_cls']), ref_cls, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_bbox']), ref_bbox,
                               rtol=1e-4)


def test_vfnet_loss_matches_reference():
    """VFNet training loss (reference vfnet_head.py::loss: ATSS targets on
    8x-stride center-offset-0 anchors transformed to ltrb, GIoU init/refine
    losses IoU-weighted and normalized by the weight sums, varifocal cls
    with refined-IoU targets over num_pos)."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    mmcv = refbridge.ref_import('mmcv')
    s_img = 128
    strides = (8, 16, 32, 64, 128)
    ref = heads.VFNetHead(
        num_classes=NUM_CLASSES, in_channels=8, feat_channels=32,
        stacked_convs=1, strides=list(strides), center_sampling=False,
        dcn_on_last_conv=False, use_atss=True, use_vfl=True,
        loss_cls=dict(type='VarifocalLoss', use_sigmoid=True, alpha=0.75,
                      gamma=2.0, iou_weighted=True, loss_weight=1.0),
        loss_bbox=dict(type='GIoULoss', loss_weight=1.5),
        loss_bbox_refine=dict(type='GIoULoss', loss_weight=2.0),
        train_cfg=mmcv.Config(dict(
            assigner=dict(type='ATSSAssigner', topk=9),
            allowed_border=-1, pos_weight=-1, debug=False)))
    ref.requires_grad_(False)
    cls_maps = [
        (RNG.randn(2, NUM_CLASSES, s_img // s, s_img // s)).astype(
            np.float32) for s in strides
    ]
    init_maps = [
        np.abs(RNG.randn(2, 4, s_img // s, s_img // s) * 8).astype(
            np.float32) for s in strides
    ]
    refine_maps = [
        np.abs(RNG.randn(2, 4, s_img // s, s_img // s) * 8).astype(
            np.float32) for s in strides
    ]
    boxes = []
    for _ in range(3):
        x, y = RNG.rand(2) * 60
        w, h = RNG.rand(2) * 50 + 12
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in init_maps],
            [torch.from_numpy(m) for m in refine_maps],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_cls = float(ref_losses['loss_cls'])
    ref_bbox = float(ref_losses['loss_bbox'])
    ref_rf = float(ref_losses['loss_bbox_rf'])

    from tpudet.models.dense_heads.vfnet_head import VFNetHead
    head = VFNetHead(num_classes=NUM_CLASSES, in_channels=8)
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
    mine = head.loss(
        (tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in cls_maps),
         tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in init_maps),
         tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in refine_maps)),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels), jnp.asarray(valid))
    np.testing.assert_allclose(float(mine['loss_cls']), ref_cls, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_bbox']), ref_bbox,
                               rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_bbox_rf']), ref_rf,
                               rtol=1e-4)


def test_yolof_loss_matches_reference():
    """YOLOF training loss (reference yolof_head.py::loss: UniformAssigner
    4x L1 matching on anchors AND decoded predictions, pos_ignore_thr .15 /
    neg_ignore_thr .7, focal cls + GIoU on the matched predicted boxes,
    num_total_pos normalization)."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    mmcv = refbridge.ref_import('mmcv')
    s_img = 128
    ref = heads.YOLOFHead(
        num_classes=NUM_CLASSES, in_channels=8, num_cls_convs=1,
        num_reg_convs=1, reg_decoded_bbox=True,
        anchor_generator=dict(type='AnchorGenerator', ratios=[1.0],
                              scales=[1, 2, 4, 8, 16], strides=[32]),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[.0, .0, .0, .0],
                        target_stds=[1., 1., 1., 1.],
                        add_ctr_clamp=True, ctr_clamp=32),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='GIoULoss', loss_weight=1.0),
        train_cfg=mmcv.Config(dict(
            assigner=dict(type='UniformAssigner', pos_ignore_thr=0.15,
                          neg_ignore_thr=0.7),
            allowed_border=-1, pos_weight=-1, debug=False)))
    ref.requires_grad_(False)
    f = s_img // 32
    cls_map = (RNG.randn(2, 5 * NUM_CLASSES, f, f)).astype(np.float32)
    reg_map = (RNG.randn(2, 5 * 4, f, f) * 0.5).astype(np.float32)
    boxes = []
    for _ in range(3):
        x, y = RNG.rand(2) * 60
        w, h = RNG.rand(2) * 50 + 12
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(cls_map)], [torch.from_numpy(reg_map)],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_cls = float(ref_losses['loss_cls'])
    ref_bbox = float(ref_losses['loss_bbox'])

    from tpudet.models.dense_heads.yolof_head import YOLOFHead
    head = YOLOFHead(num_classes=NUM_CLASSES, in_channels=8)
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
    mine = head.loss(
        ((jnp.asarray(np.transpose(cls_map, (0, 2, 3, 1))),),
         (jnp.asarray(np.transpose(reg_map, (0, 2, 3, 1))),)),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels), jnp.asarray(valid))
    np.testing.assert_allclose(float(mine['loss_cls']), ref_cls, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_bbox']), ref_bbox,
                               rtol=1e-4)


def test_autoassign_loss_matches_reference():
    """AutoAssign training loss (reference autoassign_head.py::loss:
    gaussian center prior, exp(3*p_pos) confidence reweighting per gt,
    per-point max-IoU negative discounting with per-gt min-max
    normalization and gt-major last-write class scatter, center loss
    num_gt/prior_sum)."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    s_img = 128
    strides = (8, 16, 32, 64, 128)
    ref = heads.AutoAssignHead(
        num_classes=NUM_CLASSES, in_channels=8, feat_channels=32,
        stacked_convs=1, strides=list(strides),
        loss_bbox=dict(type='GIoULoss', loss_weight=5.0))
    ref.requires_grad_(False)
    cls_maps = [
        (RNG.randn(2, NUM_CLASSES, s_img // s, s_img // s)).astype(
            np.float32) for s in strides
    ]
    reg_maps = [
        np.abs(RNG.randn(2, 4, s_img // s, s_img // s) * 8).astype(
            np.float32) for s in strides
    ]
    obj_maps = [
        (RNG.randn(2, 1, s_img // s, s_img // s)).astype(np.float32)
        for s in strides
    ]
    boxes = []
    for _ in range(3):
        x, y = RNG.rand(2) * 60
        w, h = RNG.rand(2) * 50 + 12
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in reg_maps],
            [torch.from_numpy(m) for m in obj_maps],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_pos = float(ref_losses['loss_pos'])
    ref_neg = float(ref_losses['loss_neg'])
    ref_center = float(ref_losses['loss_center'])

    from tpudet.models.dense_heads.autoassign_head import AutoAssignHead
    head = AutoAssignHead(num_classes=NUM_CLASSES, in_channels=8)
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
    center_mean = jnp.zeros((NUM_CLASSES, 2), jnp.float32)
    center_sigma = jnp.ones((NUM_CLASSES, 2), jnp.float32)
    mine = head.loss(
        (tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in cls_maps),
         tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in reg_maps),
         tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in obj_maps),
         (center_mean, center_sigma)),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels), jnp.asarray(valid))
    np.testing.assert_allclose(float(mine['loss_pos']), ref_pos, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_neg']), ref_neg, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_center']), ref_center,
                               rtol=1e-4)


def test_paa_loss_matches_reference():
    """PAA training loss (reference paa_head.py::loss: MaxIoU(0.1)
    candidates, per-candidate focal+GIoU loss, per-(gt,level) top-9, the
    sklearn 2-component GMM split with the sorted comp-0 prefix
    separation, focal over max(num_pos, num_imgs), GIoU weighted by IoU
    targets over their sum, BCE IoU branch at weight 0.5)."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    mmcv = refbridge.ref_import('mmcv')
    s_img = 128
    strides = (8, 16, 32, 64, 128)
    ref = heads.PAAHead(
        num_classes=NUM_CLASSES, in_channels=8, feat_channels=32,
        stacked_convs=1, reg_decoded_bbox=True, score_voting=True, topk=9,
        anchor_generator=dict(type='AnchorGenerator', ratios=[1.0],
                              octave_base_scale=8, scales_per_octave=1,
                              strides=list(strides)),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[.0, .0, .0, .0],
                        target_stds=[0.1, 0.1, 0.2, 0.2]),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='GIoULoss', loss_weight=1.3),
        loss_centerness=dict(type='CrossEntropyLoss', use_sigmoid=True,
                             loss_weight=0.5),
        train_cfg=mmcv.Config(dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.1,
                          neg_iou_thr=0.1, min_pos_iou=0,
                          ignore_iof_thr=-1),
            allowed_border=-1, pos_weight=-1, debug=False)))
    ref.requires_grad_(False)
    cls_maps = [
        (RNG.randn(2, NUM_CLASSES, s_img // s, s_img // s)).astype(
            np.float32) for s in strides
    ]
    reg_maps = [
        (RNG.randn(2, 4, s_img // s, s_img // s) * 0.5).astype(np.float32)
        for s in strides
    ]
    iou_maps = [
        (RNG.randn(2, 1, s_img // s, s_img // s)).astype(np.float32)
        for s in strides
    ]
    boxes = []
    for _ in range(3):
        x, y = RNG.rand(2) * 60
        w, h = RNG.rand(2) * 50 + 12
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in reg_maps],
            [torch.from_numpy(m) for m in iou_maps],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_cls = float(ref_losses['loss_cls'])
    ref_bbox = float(ref_losses['loss_bbox'])
    ref_iou = float(ref_losses['loss_iou'])

    from tpudet.models.dense_heads.paa_head import PAAHead
    head = PAAHead(num_classes=NUM_CLASSES, in_channels=8)
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
    mine = head.loss(
        (tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in cls_maps),
         tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in reg_maps),
         tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in iou_maps)),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels), jnp.asarray(valid))
    np.testing.assert_allclose(float(mine['loss_cls']), ref_cls, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_bbox']), ref_bbox,
                               rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_iou']), ref_iou, rtol=1e-4)


def test_free_anchor_loss_matches_reference():
    """FreeAnchor training loss (reference free_anchor_retina_head.py::
    loss: top-50 IoU bags, positive bag -alpha*log(Mean-max(Pcls*Ploc)),
    saturated-linear decoded-IoU anchor->object probability, focal-
    modulated negative loss over num_pos*topk)."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    s_img = 128
    strides = (8, 16, 32, 64, 128)
    ref = heads.FreeAnchorRetinaHead(
        num_classes=NUM_CLASSES, in_channels=8, feat_channels=32,
        stacked_convs=1,
        anchor_generator=dict(type='AnchorGenerator', octave_base_scale=4,
                              scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                              strides=list(strides)),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[0.0] * 4,
                        target_stds=[0.1, 0.1, 0.2, 0.2]),
        loss_bbox=dict(type='SmoothL1Loss', beta=0.11, loss_weight=0.75))
    ref.requires_grad_(False)
    # the reference's loss calls get_anchors without a device (defaults
    # to cuda) — pin it to cpu
    _orig_get_anchors = ref.get_anchors
    ref.get_anchors = (
        lambda fs, metas, device='cpu': _orig_get_anchors(fs, metas, 'cpu'))
    cls_maps = [
        (RNG.randn(2, 9 * NUM_CLASSES, s_img // s, s_img // s)).astype(
            np.float32) for s in strides
    ]
    reg_maps = [
        (RNG.randn(2, 36, s_img // s, s_img // s) * 0.3).astype(np.float32)
        for s in strides
    ]
    boxes = []
    # gts large enough that every top-50 bag fills with positive-IoU
    # anchors — zero-IoU ties would make the bag membership ambiguous
    # between torch.topk and lax.top_k
    for _ in range(3):
        x, y = RNG.rand(2) * 50
        w, h = RNG.rand(2) * 30 + 40
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in reg_maps],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_pos = float(ref_losses['positive_bag_loss'])
    ref_neg = float(ref_losses['negative_bag_loss'])

    from tpudet.models.dense_heads.free_anchor_retina_head import \
        FreeAnchorRetinaHead
    head = FreeAnchorRetinaHead(num_classes=NUM_CLASSES, in_channels=8)
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
    mine = head.loss(
        (tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in cls_maps),
         tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in reg_maps)),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels), jnp.asarray(valid))
    np.testing.assert_allclose(float(mine['positive_bag_loss']), ref_pos,
                               rtol=1e-4)
    np.testing.assert_allclose(float(mine['negative_bag_loss']), ref_neg,
                               rtol=1e-4)


def _moment_decode_np(off_maps, strides, num_points=9):
    """Numpy twin of the reference 'moment' points2bbox (unbiased std,
    moment_transfer at its zero init) + image-frame shift, used to feed
    tpudet's box-level RepPoints loss from raw offset maps."""
    out = []
    for m, s in zip(off_maps, strides):
        bsz, _, h, w = m.shape
        pts = m.transpose(0, 2, 3, 1).reshape(bsz, h * w, num_points, 2)
        py, px = pts[..., 0], pts[..., 1]
        my = py.mean(-1, keepdims=True)
        mx = px.mean(-1, keepdims=True)
        sy = np.sqrt(((py - my)**2).sum(-1, keepdims=True) /
                     (num_points - 1))
        sx = np.sqrt(((px - mx)**2).sum(-1, keepdims=True) /
                     (num_points - 1))
        box = np.concatenate([mx - sx, my - sy, mx + sx, my + sy], -1)
        cx = np.tile(np.arange(w, dtype=np.float32), h) * s
        cy = np.repeat(np.arange(h, dtype=np.float32), w) * s
        center = np.stack([cx, cy, cx, cy], -1)[None]
        out.append(jnp.asarray(box * s + center, jnp.float32))
    return tuple(out)


def test_reppoints_loss_matches_reference():
    """RepPoints training loss (reference reppoints_head.py::loss: init
    stage PointAssigner(scale 4, pos_num 1) on point centers, refine
    stage MaxIoU(0.5/0.4) on detached init boxes, moment transform with
    unbiased std, smooth-L1(beta .11) at weights 0.5/1.0 normalized by
    point_base_scale*stride, focal cls over refine positives)."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    mmcv = refbridge.ref_import('mmcv')
    s_img = 128
    strides = (8, 16, 32, 64, 128)
    ref = heads.RepPointsHead(
        num_classes=NUM_CLASSES, in_channels=8, feat_channels=32,
        point_feat_channels=16, stacked_convs=1,
        point_strides=list(strides), point_base_scale=4,
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox_init=dict(type='SmoothL1Loss', beta=0.11,
                            loss_weight=0.5),
        loss_bbox_refine=dict(type='SmoothL1Loss', beta=0.11,
                              loss_weight=1.0),
        transform_method='moment',
        train_cfg=mmcv.Config(dict(
            init=dict(assigner=dict(type='PointAssigner', scale=4,
                                    pos_num=1),
                      allowed_border=-1, pos_weight=-1, debug=False),
            refine=dict(assigner=dict(type='MaxIoUAssigner',
                                      pos_iou_thr=0.5, neg_iou_thr=0.4,
                                      min_pos_iou=0, ignore_iof_thr=-1),
                        allowed_border=-1, pos_weight=-1, debug=False))))
    ref.requires_grad_(False)
    cls_maps = [
        (RNG.randn(2, NUM_CLASSES, s_img // s, s_img // s)).astype(
            np.float32) for s in strides
    ]
    init_maps = [
        (RNG.randn(2, 18, s_img // s, s_img // s)).astype(np.float32)
        for s in strides
    ]
    refine_maps = [
        (RNG.randn(2, 18, s_img // s, s_img // s)).astype(np.float32)
        for s in strides
    ]
    boxes = []
    for _ in range(3):
        x, y = RNG.rand(2) * 60
        w, h = RNG.rand(2) * 50 + 12
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in init_maps],
            [torch.from_numpy(m) for m in refine_maps],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_cls = sum(float(v) for v in ref_losses['loss_cls'])
    ref_init = sum(float(v) for v in ref_losses['loss_pts_init'])
    ref_refine = sum(float(v) for v in ref_losses['loss_pts_refine'])

    from tpudet.models.dense_heads.reppoints_head import RepPointsHead
    head = RepPointsHead(num_classes=NUM_CLASSES, in_channels=8)
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
    mine = head.loss(
        (tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in cls_maps),
         _moment_decode_np(init_maps, strides),
         _moment_decode_np(refine_maps, strides)),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels), jnp.asarray(valid))
    np.testing.assert_allclose(float(mine['loss_cls']), ref_cls, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_pts_init']), ref_init,
                               rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_pts_refine']), ref_refine,
                               rtol=1e-4)


def test_detr_loss_matches_reference():
    """DETR training loss (reference detr_head.py::loss_single: Hungarian
    matching with cls/L1/GIoU costs, softmax CE with bg class weight 0.1
    over num_pos + 0.1*num_neg, L1(5.0) and GIoU(2.0) on image-frame
    boxes over num_pos) on the final decoder layer + aux layers."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    mmcv = refbridge.ref_import('mmcv')
    s_img = 128
    Q = 20
    ref = heads.DETRHead(
        num_classes=NUM_CLASSES, in_channels=16, num_query=Q,
        transformer=dict(
            type='Transformer',
            encoder=dict(
                type='DetrTransformerEncoder', num_layers=1,
                transformerlayers=dict(
                    type='BaseTransformerLayer',
                    attn_cfgs=[dict(type='MultiheadAttention',
                                    embed_dims=32, num_heads=2)],
                    feedforward_channels=64, ffn_dropout=0.1,
                    operation_order=('self_attn', 'norm', 'ffn', 'norm'))),
            decoder=dict(
                type='DetrTransformerDecoder', return_intermediate=True,
                num_layers=1,
                transformerlayers=dict(
                    type='DetrTransformerDecoderLayer',
                    attn_cfgs=dict(type='MultiheadAttention',
                                   embed_dims=32, num_heads=2),
                    feedforward_channels=64, ffn_dropout=0.1,
                    operation_order=('self_attn', 'norm', 'cross_attn',
                                     'norm', 'ffn', 'norm')))),
        positional_encoding=dict(type='SinePositionalEncoding',
                                 num_feats=16, normalize=True),
        loss_cls=dict(type='CrossEntropyLoss', bg_cls_weight=0.1,
                      use_sigmoid=False, loss_weight=1.0, class_weight=1.0),
        loss_bbox=dict(type='L1Loss', loss_weight=5.0),
        loss_iou=dict(type='GIoULoss', loss_weight=2.0),
        train_cfg=mmcv.Config(dict(assigner=dict(
            type='HungarianAssigner',
            cls_cost=dict(type='ClassificationCost', weight=1.),
            reg_cost=dict(type='BBoxL1Cost', weight=5.0),
            iou_cost=dict(type='IoUCost', iou_mode='giou', weight=2.0)))))
    ref.requires_grad_(False)

    L = 2
    cls_all = (RNG.randn(L, 2, Q, NUM_CLASSES + 1)).astype(np.float32)
    bbox_all = (1.0 / (1.0 + np.exp(-RNG.randn(L, 2, Q, 4)))).astype(
        np.float32)
    boxes = []
    for _ in range(3):
        x, y = RNG.rand(2) * 60
        w, h = RNG.rand(2) * 50 + 12
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(cls_all)], [torch.from_numpy(bbox_all)],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)

    from tpudet.models.dense_heads.detr_head import DETRHead
    head = DETRHead(num_classes=NUM_CLASSES, in_channels=16, num_query=Q)
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
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels), jnp.asarray(valid))
    np.testing.assert_allclose(float(mine['loss_cls']),
                               float(ref_losses['loss_cls']), rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_bbox']),
                               float(ref_losses['loss_bbox']), rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_iou']),
                               float(ref_losses['loss_iou']), rtol=1e-4)
    np.testing.assert_allclose(float(mine['d0.loss_cls']),
                               float(ref_losses['d0.loss_cls']), rtol=1e-4)
    np.testing.assert_allclose(float(mine['d0.loss_bbox']),
                               float(ref_losses['d0.loss_bbox']), rtol=1e-4)
    np.testing.assert_allclose(float(mine['d0.loss_iou']),
                               float(ref_losses['d0.loss_iou']), rtol=1e-4)


def test_cornernet_loss_matches_reference():
    """CornerNet training loss (reference corner_head.py::loss: gaussian
    focal heatmaps normalized by exact-corner counts, associative
    embedding pull/push summed over the batch, smooth-L1 corner offsets
    over corner-position counts, two hourglass stacks)."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    s_img = 128
    f = 32  # both stacks share the full corner resolution
    ref = heads.CornerHead(
        num_classes=NUM_CLASSES, in_channels=8, num_feat_levels=2,
        corner_emb_channels=1,
        loss_heatmap=dict(type='GaussianFocalLoss', alpha=2.0, gamma=4.0,
                          loss_weight=1),
        loss_embedding=dict(type='AssociativeEmbeddingLoss',
                            pull_weight=0.10, push_weight=0.10),
        loss_offset=dict(type='SmoothL1Loss', beta=1.0, loss_weight=1))
    ref.requires_grad_(False)
    tl_heats = [(RNG.randn(2, NUM_CLASSES, f, f)).astype(np.float32)
                for _ in range(2)]
    br_heats = [(RNG.randn(2, NUM_CLASSES, f, f)).astype(np.float32)
                for _ in range(2)]
    tl_embs = [(RNG.randn(2, 1, f, f)).astype(np.float32) for _ in range(2)]
    br_embs = [(RNG.randn(2, 1, f, f)).astype(np.float32) for _ in range(2)]
    tl_offs = [(RNG.randn(2, 2, f, f)).astype(np.float32) for _ in range(2)]
    br_offs = [(RNG.randn(2, 2, f, f)).astype(np.float32) for _ in range(2)]
    boxes = []
    for _ in range(3):
        x, y = RNG.rand(2) * 60
        w, h = RNG.rand(2) * 50 + 12
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in tl_heats],
            [torch.from_numpy(m) for m in br_heats],
            [torch.from_numpy(m) for m in tl_embs],
            [torch.from_numpy(m) for m in br_embs],
            [torch.from_numpy(m) for m in tl_offs],
            [torch.from_numpy(m) for m in br_offs],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_det = sum(float(v) for v in ref_losses['det_loss'])
    ref_pull = sum(float(v) for v in ref_losses['pull_loss'])
    ref_push = sum(float(v) for v in ref_losses['push_loss'])
    ref_off = sum(float(v) for v in ref_losses['off_loss'])

    from tpudet.models.dense_heads.corner_head import CornerHead
    head = CornerHead(num_classes=NUM_CLASSES, in_channels=8)
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

    def nhwc(ms):
        return tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1))) for m in ms)

    mine = head.loss(
        (nhwc(tl_heats), nhwc(br_heats), nhwc(tl_embs), nhwc(br_embs),
         nhwc(tl_offs), nhwc(br_offs)),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels),
        jnp.asarray(valid), img_size=float(s_img))
    np.testing.assert_allclose(float(mine['loss_heatmap']), ref_det,
                               rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_pull']), ref_pull,
                               rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_push']), ref_push,
                               rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_offset']), ref_off,
                               rtol=1e-4)


def test_ld_loss_matches_reference():
    """Localization-distillation loss (reference ld_head.py::loss_single:
    GFL losses + temperature-10 KL on the positive anchors' reg
    distributions vs the teacher's, weighted by the detached max sigmoid
    cls score, avg_factor 4 per corner row, NOT renormalized by the
    quality-weight sum)."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    mmcv = refbridge.ref_import('mmcv')
    s_img = 128
    strides = (8, 16, 32, 64, 128)
    reg_max = 16
    ref = heads.LDHead(
        num_classes=NUM_CLASSES, in_channels=8, feat_channels=32,
        stacked_convs=1, reg_max=reg_max,
        anchor_generator=dict(type='AnchorGenerator', ratios=[1.0],
                              octave_base_scale=8, scales_per_octave=1,
                              strides=list(strides)),
        loss_cls=dict(type='QualityFocalLoss', use_sigmoid=True, beta=2.0,
                      loss_weight=1.0),
        loss_dfl=dict(type='DistributionFocalLoss', loss_weight=0.25),
        loss_bbox=dict(type='GIoULoss', loss_weight=2.0),
        loss_ld=dict(type='KnowledgeDistillationKLDivLoss',
                     loss_weight=0.25, T=10),
        train_cfg=mmcv.Config(dict(
            assigner=dict(type='ATSSAssigner', topk=9),
            allowed_border=-1, pos_weight=-1, debug=False)))
    ref.requires_grad_(False)
    cls_maps = [
        (RNG.randn(2, NUM_CLASSES, s_img // s, s_img // s)).astype(
            np.float32) for s in strides
    ]
    reg_maps = [
        (RNG.randn(2, 4 * (reg_max + 1), s_img // s, s_img // s)).astype(
            np.float32) for s in strides
    ]
    soft_maps = [
        (RNG.randn(2, 4 * (reg_max + 1), s_img // s, s_img // s)).astype(
            np.float32) for s in strides
    ]
    boxes = []
    for _ in range(3):
        x, y = RNG.rand(2) * 60
        w, h = RNG.rand(2) * 50 + 12
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in reg_maps],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            [torch.from_numpy(m) for m in soft_maps],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_ld = sum(float(v) for v in ref_losses['loss_ld'])
    ref_cls = sum(float(v) for v in ref_losses['loss_cls'])

    from tpudet.models.dense_heads.ld_head import LDHead
    head = LDHead(num_classes=NUM_CLASSES, in_channels=8, reg_max=reg_max)
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

    def nhwc(ms):
        return tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1))) for m in ms)

    mine = head.loss_with_teacher(
        (nhwc(cls_maps), nhwc(reg_maps)),
        (nhwc(cls_maps), nhwc(soft_maps)),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels), jnp.asarray(valid))
    np.testing.assert_allclose(float(mine['loss_cls']), ref_cls, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_ld']), ref_ld, rtol=1e-4)


def test_sabl_retina_loss_matches_reference():
    """SABL-RetinaNet training loss (reference sabl_retina_head.py::loss:
    ApproxMaxIoU assignment of 9-approx squares, bucketing coder targets,
    focal cls, bucket BCE over num_pos*4*side_num, within-bucket
    smooth-L1 over num_pos*4*offset_topk)."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    mmcv = refbridge.ref_import('mmcv')
    s_img = 128
    strides = (8, 16, 32, 64, 128)
    side_num = 7  # ceil(num_buckets/2) for 14 buckets
    ref = heads.SABLRetinaHead(
        num_classes=NUM_CLASSES, in_channels=8, feat_channels=32,
        stacked_convs=1,
        approx_anchor_generator=dict(type='AnchorGenerator',
                                     octave_base_scale=4,
                                     scales_per_octave=3,
                                     ratios=[0.5, 1.0, 2.0],
                                     strides=list(strides)),
        square_anchor_generator=dict(type='AnchorGenerator', ratios=[1.0],
                                     scales=[4], strides=list(strides)),
        bbox_coder=dict(type='BucketingBBoxCoder', num_buckets=14,
                        scale_factor=3.0),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,
                           loss_weight=1.5),
        loss_bbox_reg=dict(type='SmoothL1Loss', beta=1.0 / 9.0,
                           loss_weight=1.5),
        train_cfg=mmcv.Config(dict(
            assigner=dict(type='ApproxMaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.4, min_pos_iou=0.0,
                          ignore_iof_thr=-1),
            allowed_border=-1, pos_weight=-1, debug=False)))
    ref.requires_grad_(False)
    cls_maps = [
        (RNG.randn(2, NUM_CLASSES, s_img // s, s_img // s)).astype(
            np.float32) for s in strides
    ]
    bcls_maps = [
        (RNG.randn(2, 4 * side_num, s_img // s, s_img // s)).astype(
            np.float32) for s in strides
    ]
    breg_maps = [
        (RNG.randn(2, 4 * side_num, s_img // s, s_img // s)).astype(
            np.float32) for s in strides
    ]
    boxes = []
    for _ in range(3):
        x, y = RNG.rand(2) * 60
        w, h = RNG.rand(2) * 50 + 12
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in cls_maps],
            [(torch.from_numpy(c), torch.from_numpy(r))
             for c, r in zip(bcls_maps, breg_maps)],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_cls = sum(float(v) for v in ref_losses['loss_cls'])
    ref_bcls = sum(float(v) for v in ref_losses['loss_bbox_cls'])
    ref_breg = sum(float(v) for v in ref_losses['loss_bbox_reg'])

    from tpudet.models.dense_heads.sabl_retina_head import SABLRetinaHead
    head = SABLRetinaHead(num_classes=NUM_CLASSES, in_channels=8)
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

    def nhwc(ms):
        return tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1))) for m in ms)

    mine = head.loss(
        (nhwc(cls_maps), nhwc(bcls_maps), nhwc(breg_maps)),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels), jnp.asarray(valid))
    np.testing.assert_allclose(float(mine['loss_cls']), ref_cls, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_bbox_cls']), ref_bcls,
                               rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_bbox_reg']), ref_breg,
                               rtol=1e-4)


def test_pisa_retina_loss_matches_reference():
    """PISA-RetinaNet training loss (reference pisa_retinanet_head.py::
    loss + pisa_loss.py: ISR-P positive reweighting by IoU-HLR rank within
    class, CARL regression reweighting by classification score)."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    mmcv = refbridge.ref_import('mmcv')
    s_img = 128
    strides = (8, 16, 32, 64, 128)
    ref = heads.PISARetinaHead(
        num_classes=NUM_CLASSES, in_channels=8, feat_channels=32,
        stacked_convs=1,
        anchor_generator=dict(type='AnchorGenerator', octave_base_scale=4,
                              scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                              strides=list(strides)),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder', target_means=[0.0] * 4,
                        target_stds=[1.0] * 4),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='L1Loss', loss_weight=1.0),
        train_cfg=mmcv.Config(dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.4, min_pos_iou=0,
                          ignore_iof_thr=-1),
            isr=dict(k=2., bias=0.), carl=dict(k=1., bias=0.2),
            allowed_border=-1, pos_weight=-1, debug=False)))
    ref.requires_grad_(False)
    cls_maps = [
        (RNG.randn(2, 9 * NUM_CLASSES, s_img // s, s_img // s)).astype(
            np.float32) for s in strides
    ]
    reg_maps = [
        (RNG.randn(2, 36, s_img // s, s_img // s) * 0.3).astype(np.float32)
        for s in strides
    ]
    boxes = []
    for _ in range(3):
        x, y = RNG.rand(2) * 60
        w, h = RNG.rand(2) * 50 + 12
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in reg_maps],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_cls = float(ref_losses['loss_cls'])
    ref_bbox = float(ref_losses['loss_bbox'])
    ref_carl = float(ref_losses['loss_carl'])

    from tpudet.models.dense_heads.pisa_heads import PISARetinaHead
    head = PISARetinaHead(num_classes=NUM_CLASSES, in_channels=8)
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
    mine = head.loss(
        (tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in cls_maps),
         tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in reg_maps)),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels), jnp.asarray(valid))
    np.testing.assert_allclose(float(mine['loss_cls']), ref_cls, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_bbox']), ref_bbox,
                               rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_carl']), ref_carl,
                               rtol=1e-4)


def test_ga_retina_loss_matches_reference():
    """GA-RetinaNet training loss (reference guided_anchor_head.py::loss:
    scale-ranged loc targets with center/ignore rings, ApproxMaxIoU shape
    targets decoded through BoundedIoU loss, MaxIoU cls targets on the
    shape-refined guided anchors, focal cls + smooth-L1(0.04))."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    mmcv = refbridge.ref_import('mmcv')
    s_img = 128
    strides = (8, 16, 32, 64, 128)
    ref = heads.GARetinaHead(
        num_classes=NUM_CLASSES, in_channels=8, feat_channels=32,
        stacked_convs=1,
        approx_anchor_generator=dict(type='AnchorGenerator',
                                     octave_base_scale=4,
                                     scales_per_octave=3,
                                     ratios=[0.5, 1.0, 2.0],
                                     strides=list(strides)),
        square_anchor_generator=dict(type='AnchorGenerator', ratios=[1.0],
                                     scales=[4], strides=list(strides)),
        anchor_coder=dict(type='DeltaXYWHBBoxCoder',
                          target_means=[.0] * 4, target_stds=[1.0] * 4),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[.0] * 4, target_stds=[1.0] * 4),
        loc_filter_thr=0.01,
        loss_loc=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_shape=dict(type='BoundedIoULoss', beta=0.2, loss_weight=1.0),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='SmoothL1Loss', beta=0.04, loss_weight=1.0),
        train_cfg=mmcv.Config(dict(
            ga_assigner=dict(type='ApproxMaxIoUAssigner', pos_iou_thr=0.5,
                             neg_iou_thr=0.4, min_pos_iou=0.4,
                             ignore_iof_thr=-1),
            ga_sampler=dict(type='RandomSampler', num=256,
                            pos_fraction=0.5, neg_pos_ub=-1,
                            add_gt_as_proposals=False),
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.5, min_pos_iou=0.0,
                          ignore_iof_thr=-1),
            center_ratio=0.2, ignore_ratio=0.5,
            allowed_border=-1, pos_weight=-1, debug=False)))
    ref.requires_grad_(False)
    cls_maps = [
        (RNG.randn(2, NUM_CLASSES, s_img // s, s_img // s)).astype(
            np.float32) for s in strides
    ]
    reg_maps = [
        (RNG.randn(2, 4, s_img // s, s_img // s) * 0.3).astype(np.float32)
        for s in strides
    ]
    shape_maps = [
        (RNG.randn(2, 2, s_img // s, s_img // s) * 0.3).astype(np.float32)
        for s in strides
    ]
    loc_maps = [
        (RNG.randn(2, 1, s_img // s, s_img // s)).astype(np.float32)
        for s in strides
    ]
    boxes = []
    for _ in range(3):
        x, y = RNG.rand(2) * 60
        w, h = RNG.rand(2) * 50 + 12
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in reg_maps],
            [torch.from_numpy(m) for m in shape_maps],
            [torch.from_numpy(m) for m in loc_maps],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_cls = sum(float(v) for v in ref_losses['loss_cls'])
    ref_bbox = sum(float(v) for v in ref_losses['loss_bbox'])
    ref_shape = sum(float(v) for v in ref_losses['loss_shape'])
    ref_loc = sum(float(v) for v in ref_losses['loss_loc'])

    from tpudet.models.dense_heads.guided_anchor_head import GARetinaHead
    head = GARetinaHead(num_classes=NUM_CLASSES, in_channels=8)
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

    def nhwc(ms):
        return tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1))) for m in ms)

    mine = head.loss(
        (nhwc(cls_maps), nhwc(reg_maps), nhwc(shape_maps), nhwc(loc_maps)),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels), jnp.asarray(valid))
    np.testing.assert_allclose(float(mine['loss_loc']), ref_loc, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_shape']), ref_shape,
                               rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_cls']), ref_cls, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_bbox']), ref_bbox,
                               rtol=1e-4)


def test_centripetal_loss_matches_reference():
    """CentripetalNet training loss (reference centripetal_head.py::
    loss_single: CornerNet heatmap/offset + smooth-L1 guiding (0.05) and
    centripetal (1.0) shifts at corner positions)."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    s_img = 128
    f = 32
    ref = heads.CentripetalHead(
        num_classes=NUM_CLASSES, in_channels=8, num_feat_levels=2,
        corner_emb_channels=0,
        loss_heatmap=dict(type='GaussianFocalLoss', alpha=2.0, gamma=4.0,
                          loss_weight=1),
        loss_offset=dict(type='SmoothL1Loss', beta=1.0, loss_weight=1),
        loss_guiding_shift=dict(type='SmoothL1Loss', beta=1.0,
                                loss_weight=0.05),
        loss_centripetal_shift=dict(type='SmoothL1Loss', beta=1.0,
                                    loss_weight=1))
    ref.requires_grad_(False)

    def maps(ch):
        return [(RNG.randn(2, ch, f, f)).astype(np.float32)
                for _ in range(2)]

    tl_heats, br_heats = maps(NUM_CLASSES), maps(NUM_CLASSES)
    tl_offs, br_offs = maps(2), maps(2)
    tl_guides, br_guides = maps(2), maps(2)
    tl_centris, br_centris = maps(2), maps(2)
    boxes = []
    for _ in range(3):
        x, y = RNG.rand(2) * 60
        w, h = RNG.rand(2) * 50 + 12
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in tl_heats],
            [torch.from_numpy(m) for m in br_heats],
            [torch.from_numpy(m) for m in tl_offs],
            [torch.from_numpy(m) for m in br_offs],
            [torch.from_numpy(m) for m in tl_guides],
            [torch.from_numpy(m) for m in br_guides],
            [torch.from_numpy(m) for m in tl_centris],
            [torch.from_numpy(m) for m in br_centris],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_det = sum(float(v) for v in ref_losses['det_loss'])
    ref_off = sum(float(v) for v in ref_losses['off_loss'])
    ref_guide = sum(float(v) for v in ref_losses['guiding_loss'])
    ref_centri = sum(float(v) for v in ref_losses['centripetal_loss'])

    from tpudet.models.dense_heads.centripetal_head import CentripetalHead
    head = CentripetalHead(num_classes=NUM_CLASSES, in_channels=8)
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

    def nhwc(ms):
        return tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1))) for m in ms)

    mine = head.loss(
        (nhwc(tl_heats), nhwc(br_heats), nhwc(tl_offs), nhwc(br_offs),
         nhwc(tl_guides), nhwc(br_guides), nhwc(tl_centris),
         nhwc(br_centris)),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels),
        jnp.asarray(valid), img_size=float(s_img))
    np.testing.assert_allclose(float(mine['loss_heatmap']), ref_det,
                               rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_offset']), ref_off,
                               rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_guiding']), ref_guide,
                               rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_centripetal']), ref_centri,
                               rtol=1e-4)


def test_ssd_loss_matches_reference():
    """SSD300 training loss (reference ssd_head.py::loss_single: MaxIoU
    assignment with low-quality matches, softmax CE with 3:1 OHEM hard
    negatives, smooth-L1 on encoded deltas, num_total_pos norm)."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    mmcv = refbridge.ref_import('mmcv')
    s_img = 300
    strides = (8, 16, 32, 64, 100, 300)
    feat_sizes = (38, 19, 10, 5, 3, 1)
    ratios = ([2], [2, 3], [2, 3], [2, 3], [2], [2])
    ref = heads.SSDHead(
        num_classes=NUM_CLASSES,
        in_channels=(8, 8, 8, 8, 8, 8),
        anchor_generator=dict(
            type='SSDAnchorGenerator', scale_major=False, input_size=300,
            basesize_ratio_range=(0.15, 0.9), strides=list(strides),
            ratios=[list(r) for r in ratios]),
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
    num_anchors = [2 + 2 * len(r) for r in ratios]
    cls_maps = [
        (RNG.randn(2, a * (NUM_CLASSES + 1), f, f)).astype(np.float32)
        for a, f in zip(num_anchors, feat_sizes)
    ]
    reg_maps = [
        (RNG.randn(2, a * 4, f, f) * 0.3).astype(np.float32)
        for a, f in zip(num_anchors, feat_sizes)
    ]
    boxes = []
    for _ in range(3):
        x, y = RNG.rand(2) * 150
        w, h = RNG.rand(2) * 120 + 30
        boxes.append([x, y, min(x + w, s_img - 1), min(y + h, s_img - 1)])
    gt_boxes = np.array(boxes, np.float32)
    gt_labels = RNG.randint(0, NUM_CLASSES, size=3).astype(np.int64)

    with torch.no_grad():
        ref_losses = ref.loss(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in reg_maps],
            [torch.from_numpy(gt_boxes), torch.from_numpy(gt_boxes[:2])],
            [torch.from_numpy(gt_labels), torch.from_numpy(gt_labels[:2])],
            img_metas=[{'img_shape': (s_img, s_img, 3),
                        'pad_shape': (s_img, s_img, 3)}] * 2)
    ref_cls = sum(float(v) for v in ref_losses['loss_cls'])
    ref_bbox = sum(float(v) for v in ref_losses['loss_bbox'])

    from tpudet.models.dense_heads.ssd_head import SSDHead
    head = SSDHead(num_classes=NUM_CLASSES)
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
    mine = head.loss(
        (tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in cls_maps),
         tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1)))
               for m in reg_maps)),
        jnp.asarray(pad_boxes), jnp.asarray(pad_labels), jnp.asarray(valid))
    np.testing.assert_allclose(float(mine['loss_cls']), ref_cls, rtol=1e-4)
    np.testing.assert_allclose(float(mine['loss_bbox']), ref_bbox,
                               rtol=1e-4)
