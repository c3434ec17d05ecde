"""Cascade R-CNN tests: 3-stage refinement + per-stage losses."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def cascade_cfg(num_classes=4):
    return dict(
        type='CascadeRCNN',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        rpn_head=dict(type='RPNHead', in_channels=64, feat_channels=64),
        roi_head=dict(type='CascadeRoIHead', num_classes=num_classes,
                      in_channels=64, num_samples=32),
        train_cfg=dict(rpn_proposal=dict(nms_pre=100, max_per_img=50)),
        test_cfg=dict(rpn=dict(nms_pre=100, max_per_img=50),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=15)))


def test_cascade_rcnn_train_and_infer():
    model = build_detector(cascade_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(3,), num_classes=4)
    variables = jax.jit(model.init, static_argnames=('method',))(
        jax.random.PRNGKey(0), img, gt_bboxes, gt_labels, gt_valid,
        method='forward_train')
    losses, _ = model.apply(variables, img, gt_bboxes, gt_labels, gt_valid,
                            method='forward_train', mutable=['batch_stats'])
    for s in range(3):
        assert np.isfinite(float(losses[f'loss_cls_s{s}'])), s
        assert np.isfinite(float(losses[f'loss_bbox_s{s}'])), s
    # stage weights decrease: untrained CE ~ log(5) scaled by 1/.5/.25
    c0 = float(losses['loss_cls_s0'])
    c2 = float(losses['loss_cls_s2'])
    assert c2 < c0

    outputs = model.apply(variables, img)
    res = model.get_bboxes(outputs)
    assert res.bboxes.shape == (1, 15, 4)
    assert np.isfinite(np.asarray(res.bboxes)).all()
