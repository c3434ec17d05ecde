"""SABL two-stage head + Shared4Conv1FC bbox head."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def test_sabl_faster_rcnn():
    model = build_detector(dict(
        type='SABLFasterRCNN',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        rpn_head=dict(type='RPNHead', in_channels=64, feat_channels=64),
        roi_head=dict(type='SABLRoIHead', num_classes=4, in_channels=64,
                      num_samples=32),
        train_cfg=dict(rpn_proposal=dict(nms_pre=200, max_per_img=64)),
        test_cfg=dict(rpn=dict(nms_pre=200, max_per_img=64),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=10))))
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(3,), num_classes=4)
    variables = jax.jit(model.init, static_argnames=('method',))(
        jax.random.PRNGKey(0), img, gt_bboxes, gt_labels, gt_valid,
        method='forward_train')
    losses, _ = model.apply(variables, img, gt_bboxes, gt_labels, gt_valid,
                            method='forward_train', mutable=['batch_stats'])
    for k in ('loss_rpn_cls', 'loss_cls', 'loss_bucket_cls',
              'loss_bucket_reg'):
        assert np.isfinite(float(losses[k])), k

    outputs = jax.jit(model.apply)(variables, img)
    res = model.get_bboxes(outputs)
    assert res.bboxes.shape == (1, 10, 4)
    assert np.isfinite(np.asarray(res.bboxes)).all()


def test_shared4conv1fc_bbox_head_shapes():
    from tpudet.models.roi_heads import Shared4Conv1FCBBoxHead
    head = Shared4Conv1FCBBoxHead(num_classes=3, in_channels=16,
                                  conv_out_channels=16,
                                  fc_out_channels=32)
    feats = jnp.zeros((2, 5, 7, 7, 16))
    variables = head.init(jax.random.PRNGKey(0), feats)
    cls, reg = head.apply(variables, feats)
    assert cls.shape == (2, 5, 4)
    assert reg.shape == (2, 5, 12)
    assert 'shared_conv3' in variables['params']


def test_c4_roi_head_faster_rcnn():
    model = build_detector(dict(
        type='FasterRCNNC4',
        backbone=dict(type='ResNet', depth=18, out_indices=[2]),
        rpn_head=dict(type='RPNHead', in_channels=256, feat_channels=64,
                      strides=[16]),
        roi_head=dict(type='C4RoIHead', num_classes=3, in_channels=256,
                      num_samples=16),
        train_cfg=dict(rpn_proposal=dict(nms_pre=100, max_per_img=32)),
        test_cfg=dict(rpn=dict(nms_pre=100, max_per_img=32),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=8))))
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(2,), num_classes=3)
    variables = jax.jit(model.init, static_argnames=('method',))(
        jax.random.PRNGKey(0), img, gt_bboxes, gt_labels, gt_valid,
        method='forward_train')
    losses, _ = model.apply(variables, img, gt_bboxes, gt_labels, gt_valid,
                            method='forward_train', mutable=['batch_stats'])
    for k in ('loss_rpn_cls', 'loss_cls', 'loss_bbox'):
        assert np.isfinite(float(losses[k])), k
    outputs = jax.jit(model.apply)(variables, img)
    res = model.get_bboxes(outputs)
    assert res.bboxes.shape == (1, 8, 4)


def test_generic_roi_align_aggregations():
    from tpudet.ops.roi_align import generic_roi_align
    feats = [jnp.ones((64 // (2**i), 64 // (2**i), 4)) * (i + 1)
             for i in range(4)]
    # roi well inside: bilinear taps of every level stay in bounds
    rois = jnp.asarray([[64., 64., 192., 192.]])
    valid = jnp.ones((1,), bool)
    s = generic_roi_align(feats, rois, valid, out_size=2)
    # sum of per-level constants 1+2+3+4 = 10
    np.testing.assert_allclose(np.asarray(s), 10., atol=1e-4)
    c = generic_roi_align(feats, rois, valid, out_size=2,
                          aggregation='concat')
    assert c.shape == (1, 2, 2, 16)
    # concat channels sum back to the 'sum' aggregation
    np.testing.assert_allclose(
        np.asarray(jnp.sum(c.reshape(1, 2, 2, 4, 4), axis=3)),
        np.asarray(s), atol=1e-4)
