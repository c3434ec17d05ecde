"""Guided Anchoring: GA-RetinaNet and GA-RPN."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector, build_head
from tpudet.models import losses as L

from .test_forward import demo_inputs


def ga_retina_cfg():
    return dict(
        type='GARetinaNet',
        backbone=dict(type='ResNet', depth=18, out_indices=[1, 2, 3]),
        neck=dict(type='FPN', in_channels=[128, 256, 512], out_channels=64,
                  num_outs=5, add_extra_convs='on_input'),
        bbox_head=dict(type='GARetinaHead', num_classes=4, in_channels=64,
                       feat_channels=64, stacked_convs=2),
        test_cfg=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                      max_per_img=20, nms_pre=200))


def test_ga_retina_forward_loss_decode():
    model = build_detector(ga_retina_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=2, size=128, num_gts=(3, 0), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = jax.jit(model.apply)(variables, img)
    cls_scores, bbox_preds, shape_preds, loc_preds = preds
    assert cls_scores[0].shape == (2, 16, 16, 4)
    assert bbox_preds[0].shape == (2, 16, 16, 4)
    assert shape_preds[0].shape == (2, 16, 16, 2)
    assert loc_preds[0].shape == (2, 16, 16, 1)

    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    for k in ('loss_loc', 'loss_shape', 'loss_cls', 'loss_bbox'):
        assert np.isfinite(float(losses[k])), k
    assert float(losses['loss_shape']) > 0

    res = model.get_bboxes(preds)
    assert res.bboxes.shape == (2, 20, 4)


def test_ga_loc_targets_regions():
    head = build_head(dict(type='GARetinaHead', num_classes=4,
                           in_channels=64,
                           strides=(8, 16, 32, 64, 128)))
    # one 64x64 gt at image (128px): scale 64; min 4*8=32 -> lvl =
    # floor(log2(64/32)+0.5) = 1
    gt = jnp.asarray([[[32., 32., 96., 96.]]])
    valid = jnp.ones((1, 1), bool)
    sizes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    maps, avg = head.loc_targets(sizes, gt, valid)
    t1, w1 = maps[1]  # assigned level
    assert float(jnp.sum(t1)) > 0  # center region marked
    assert float(jnp.max(w1)) == 1.0
    t0, w0 = maps[0]  # lower level: only ignore region
    assert float(jnp.sum(t0)) == 0
    assert float(jnp.min(w0)) == 0.0  # ignore cells weight 0
    t2, w2 = maps[2]
    assert float(jnp.sum(t2)) == 0
    # negative weight is 0.1 where untouched
    assert np.isclose(float(jnp.max(w2[w2 < 1.])), 0.1)


def test_ga_rpn_two_stage():
    model = build_detector(dict(
        type='FasterRCNN',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        rpn_head=dict(type='GARPNHead', in_channels=64, feat_channels=64),
        roi_head=dict(type='StandardRoIHead', num_classes=4,
                      in_channels=64, num_samples=64),
        train_cfg=dict(rpn_proposal=dict(nms_pre=200, max_per_img=100)),
        test_cfg=dict(rpn=dict(nms_pre=200, max_per_img=100),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=20))))
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(3,), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, gt_bboxes, gt_labels, gt_valid,
                            method='forward_train', mutable=['batch_stats'])
    for k in ('loss_rpn_loc', 'loss_rpn_shape', 'loss_rpn_cls',
              'loss_cls'):
        assert np.isfinite(float(losses[k])), k
    outputs = jax.jit(model.apply)(variables, img)
    res = model.get_bboxes(outputs)
    assert res.bboxes.shape == (1, 20, 4)


def test_bounded_iou_loss_zero_at_match_positive_off():
    box = jnp.asarray([[10., 10., 50., 50.]])
    zero = L.bounded_iou_loss(box, box, reduction='sum')
    assert float(zero) < 1e-6  # eps in the w/h ratio terms
    off = L.bounded_iou_loss(box + jnp.asarray([5., 0., 5., 0.]), box,
                             reduction='sum')
    assert float(off) > 0
