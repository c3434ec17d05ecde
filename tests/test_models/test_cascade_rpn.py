"""Cascade RPN: analytic deform offsets, region targets, 2-stage refine."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector
from tpudet.models.dense_heads.cascade_rpn_head import anchor_offsets

from .test_forward import demo_inputs


def test_anchor_offsets_centered_anchor_is_zero():
    # anchor == the cell's implied 3x3 receptive field at its center:
    # w = h = 2*stride -> shape offset w/(k-1) - 1 = 0, ctr offset 0
    stride = 8
    # center at cell-0 grid position (0, 0), w = h = 2*stride
    anchors = jnp.asarray([[[-8., -8., 8., 8.]]])
    off = anchor_offsets(anchors, stride, (1, 1))
    np.testing.assert_allclose(np.asarray(off), 0., atol=1e-5)
    # doubling the anchor width shifts only the x shape offsets
    anchors2 = jnp.asarray([[[-16., -8., 16., 8.]]])
    off2 = np.asarray(anchor_offsets(anchors2, stride, (1, 1))).reshape(
        9, 2)
    assert np.allclose(off2[:, 0], 0.)  # dy unchanged
    assert off2[0, 1] < 0 and off2[2, 1] > 0  # x taps spread outward


def test_cascade_rpn_faster_rcnn():
    model = build_detector(dict(
        type='FasterRCNN',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        rpn_head=dict(type='CascadeRPNHead', in_channels=64,
                      feat_channels=64),
        roi_head=dict(type='StandardRoIHead', num_classes=4,
                      in_channels=64, num_samples=64),
        train_cfg=dict(rpn_proposal=dict(nms_pre=200, max_per_img=100,
                                         nms=dict(iou_threshold=0.8))),
        test_cfg=dict(rpn=dict(nms_pre=200, max_per_img=100,
                               nms=dict(iou_threshold=0.8)),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=20))))
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(3,), num_classes=4)
    variables = jax.jit(model.init, static_argnames=('method',))(
        jax.random.PRNGKey(0), img, gt_bboxes, gt_labels, gt_valid,
        method='forward_train')
    losses, _ = model.apply(variables, img, gt_bboxes, gt_labels, gt_valid,
                            method='forward_train', mutable=['batch_stats'])
    for k in ('loss_rpn_reg_s0', 'loss_rpn_cls', 'loss_rpn_bbox',
              'loss_cls'):
        assert np.isfinite(float(losses[k])), k
    assert float(losses['loss_rpn_reg_s0']) > 0

    outputs = jax.jit(model.apply)(variables, img)
    res = model.get_bboxes(outputs)
    assert res.bboxes.shape == (1, 20, 4)
