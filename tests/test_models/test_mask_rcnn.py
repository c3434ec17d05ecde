"""Mask R-CNN tests: gt-frame mask representation, mask head, end-to-end
mask loss."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.core.mask import (mask_targets_from_gt_frame,
                              polygons_to_gt_frame_mask)
from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def test_polygon_rasterization():
    # a square polygon covering the right half of its bbox
    poly = np.array([5., 0., 10., 0., 10., 10., 5., 10.])
    mask = polygons_to_gt_frame_mask([poly], np.array([0., 0., 10., 10.]),
                                     size=16)
    assert mask.shape == (16, 16)
    assert mask[:, :7].mean() < 0.1
    assert mask[:, 9:].mean() > 0.9


def test_mask_target_resample_identity():
    # roi == gt box -> target is the gt-frame mask resized
    s = 16
    gfm = np.zeros((1, s, s), np.float32)
    gfm[0, :, s // 2:] = 1.0
    gt_boxes = np.array([[10., 10., 50., 50.]], np.float32)
    rois = gt_boxes.copy()
    tgt = np.asarray(mask_targets_from_gt_frame(
        jnp.asarray(gfm), jnp.asarray(gt_boxes), jnp.asarray(rois),
        out_size=8))
    assert tgt.shape == (1, 8, 8)
    assert tgt[0, :, :3].mean() < 0.15
    assert tgt[0, :, 5:].mean() > 0.85

    # roi = left half of gt -> all background half
    rois2 = np.array([[10., 10., 30., 50.]], np.float32)
    tgt2 = np.asarray(mask_targets_from_gt_frame(
        jnp.asarray(gfm), jnp.asarray(gt_boxes), jnp.asarray(rois2),
        out_size=8))
    assert tgt2.mean() < 0.15


def mask_rcnn_cfg(num_classes=3):
    return dict(
        type='MaskRCNN',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        rpn_head=dict(type='RPNHead', in_channels=64, feat_channels=64),
        roi_head=dict(type='MaskRoIHead', num_classes=num_classes,
                      in_channels=64, num_samples=32),
        train_cfg=dict(rpn_proposal=dict(nms_pre=100, max_per_img=50)),
        test_cfg=dict(rpn=dict(nms_pre=100, max_per_img=50),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=10)))


def test_mask_rcnn_train_and_predict():
    model = build_detector(mask_rcnn_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(2,), num_classes=3)
    g = gt_bboxes.shape[1]
    gfm = jnp.asarray(np.ones((1, g, 16, 16), np.float32))
    variables = jax.jit(model.init, static_argnames=('method',))(
        jax.random.PRNGKey(0), img, gt_bboxes, gt_labels, gt_valid, gfm,
        method='forward_train')
    losses, _ = model.apply(variables, img, gt_bboxes, gt_labels, gt_valid,
                            gfm, method='forward_train',
                            mutable=['batch_stats'])
    for k in ('loss_rpn_cls', 'loss_cls', 'loss_mask'):
        assert np.isfinite(float(losses[k])), k
    assert float(losses['loss_mask']) > 0

    # detection + mask prediction path
    outputs = model.apply(variables, img)
    res = model.get_bboxes(outputs)
    masks = model.apply(variables, img, res.bboxes, res.valid,
                        method='predict_masks')
    assert masks.shape == (1, 10, 28, 28, 3)
    assert np.isfinite(np.asarray(masks)).all()
