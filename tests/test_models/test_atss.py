"""ATSS head tests."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def atss_cfg(num_classes=5):
    return dict(
        type='ATSS',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, start_level=1,
                  add_extra_convs='on_input', num_outs=5),
        bbox_head=dict(type='ATSSHead', num_classes=num_classes,
                       in_channels=64, feat_channels=64, stacked_convs=1),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=20))


def test_atss_forward_loss_bboxes():
    model = build_detector(atss_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=2, size=128, num_gts=(3, 0), num_classes=5)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = jax.jit(model.apply)(variables, img)
    cls_scores, bbox_preds, centernesses = preds
    assert cls_scores[0].shape == (2, 16, 16, 5)  # single anchor per cell
    assert bbox_preds[0].shape == (2, 16, 16, 4)
    # DeltaXYWH deltas (reference coder, stds .1/.2) — signed values

    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    for k in ('loss_cls', 'loss_bbox', 'loss_centerness'):
        assert np.isfinite(float(losses[k])), k
    # positives exist for in-image gts
    assert float(losses['loss_centerness']) > 0

    res = model.get_bboxes(preds)
    assert res.bboxes.shape == (2, 20, 4)


def test_atss_empty_gt():
    model = build_detector(atss_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(0,), num_classes=5)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = model.apply(variables, img)
    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    assert float(losses['loss_bbox']) == 0.0
    assert np.isfinite(float(losses['loss_cls']))
