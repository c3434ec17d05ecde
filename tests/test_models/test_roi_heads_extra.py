"""RoI-head breadth tests: DoubleHead, MaskScoring, Dynamic, Trident."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def base_cfg(detector, roi_head, num_classes=4, extra_roi=None):
    roi = dict(type=roi_head, num_classes=num_classes, in_channels=64,
               num_samples=32)
    roi.update(extra_roi or {})
    return dict(
        type=detector,
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        rpn_head=dict(type='RPNHead', in_channels=64, feat_channels=64),
        roi_head=roi,
        train_cfg=dict(rpn_proposal=dict(nms_pre=100, max_per_img=50)),
        test_cfg=dict(rpn=dict(nms_pre=100, max_per_img=50),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=10)))


def test_double_head_rcnn():
    model = build_detector(base_cfg('DoubleHeadRCNN', 'DoubleHeadRoIHead'))
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=64, num_gts=(2,), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    outputs = model.apply(variables, img)
    proposals, prop_valid, cls_logits, deltas = outputs
    assert cls_logits.shape[-1] == 5
    assert deltas.shape[-1] == 16  # per-class regression
    res = model.get_bboxes(outputs)
    assert res.bboxes.shape == (1, 10, 4)
    losses, _ = model.apply(variables, img, gt_bboxes, gt_labels, gt_valid,
                            method='forward_train',
                            mutable=['batch_stats'])
    assert np.isfinite(float(losses['loss_cls']))
    assert np.isfinite(float(losses['loss_bbox']))


def test_dynamic_rcnn_adapts():
    model = build_detector(base_cfg('DynamicRCNN', 'DynamicRoIHead'))
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=64, num_gts=(2,), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, gt_bboxes, gt_labels, gt_valid,
                            method='forward_train',
                            mutable=['batch_stats'])
    assert np.isfinite(float(losses['loss_cls']))
    assert np.isfinite(float(losses['loss_bbox']))
    # adapted beta stays within (0, initial]
    assert 0 < float(losses['dynamic_beta']) <= 1.0


def _mask_inputs(batch=1, size=64, num_gts=2, num_classes=3, mask_s=28):
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=batch, size=size, num_gts=(num_gts,) * batch,
        num_classes=num_classes)
    rng = np.random.RandomState(0)
    gfm = (rng.rand(batch, gt_bboxes.shape[1], mask_s, mask_s) > 0.4
           ).astype(np.float32)
    return img, gt_bboxes, gt_labels, gt_valid, jnp.asarray(gfm)


def test_mask_scoring_rcnn():
    cfg = base_cfg('MaskScoringRCNN', 'MaskScoringRoIHead', num_classes=3)
    model = build_detector(cfg)
    img, gt_bboxes, gt_labels, gt_valid, gfm = _mask_inputs()
    variables = jax.jit(model.init, static_argnames=('method',))(
        jax.random.PRNGKey(0), img, gt_bboxes, gt_labels, gt_valid, gfm,
        method='forward_train')
    losses, _ = model.apply(variables, img, gt_bboxes, gt_labels, gt_valid,
                            gfm, method='forward_train',
                            mutable=['batch_stats'])
    for k in ('loss_cls', 'loss_bbox', 'loss_mask', 'loss_mask_iou'):
        assert np.isfinite(float(losses[k])), k


def test_trident_faster_rcnn_tiled_gts():
    cfg = dict(
        type='TridentFasterRCNN',
        backbone=dict(type='TridentResNet', depth=50),
        neck=dict(type='ChannelMapper', in_channels=[2048], out_channels=64,
                  num_outs=4),
        rpn_head=dict(type='RPNHead', in_channels=64, feat_channels=64,
                      strides=[32, 64, 128, 256]),
        roi_head=dict(type='TridentRoIHead', num_classes=3, in_channels=64,
                      num_samples=16,
                      featmap_strides=[32, 64, 128, 256]),
        train_cfg=dict(rpn_proposal=dict(nms_pre=50, max_per_img=20)),
        test_cfg=dict(rpn=dict(nms_pre=50, max_per_img=20),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=5)))
    model = build_detector(cfg)
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=64, num_gts=(2,), num_classes=3)
    variables = jax.jit(model.init, static_argnames=('method',))(
        jax.random.PRNGKey(0), img, gt_bboxes, gt_labels, gt_valid,
        method='forward_train')
    losses, _ = model.apply(variables, img, gt_bboxes, gt_labels, gt_valid,
                            method='forward_train',
                            mutable=['batch_stats'])
    assert np.isfinite(float(losses['loss_cls']))
    # eval path: single branch
    outputs = model.apply(variables, img)
    res = model.get_bboxes(outputs)
    assert res.bboxes.shape == (1, 5, 4)
