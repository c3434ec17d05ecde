"""SSD family tests (SSDVGG + SSDAnchorGenerator + SSDHead OHEM)."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.core.anchors import SSDAnchorGenerator
from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def ssd_cfg(num_classes=4):
    return dict(
        type='SSD',
        backbone=dict(type='SSDVGG', input_size=300),
        bbox_head=dict(type='SSDHead', num_classes=num_classes,
                       in_channels=[512, 1024, 512, 256, 256, 256]),
        test_cfg=dict(score_thr=0.02,
                      nms=dict(type='nms', iou_threshold=0.45),
                      max_per_img=20))


def test_ssd_anchor_generator_coco_sizes():
    gen = SSDAnchorGenerator(
        strides=[8, 16, 32, 64, 100, 300],
        ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]],
        basesize_ratio_range=(0.15, 0.9), input_size=300)
    # COCO SSD300: min sizes 21, 45, 99, 153, 207, 261
    assert gen.base_sizes == [21, 45, 99, 153, 207, 261]
    assert gen.num_base_anchors == [4, 6, 6, 6, 4, 4]
    # level 0: first anchor is the 21x21 square centered at stride/2
    a0 = gen.base_anchors[0][0]
    np.testing.assert_allclose(a0[2] - a0[0], 21, atol=1e-4)
    np.testing.assert_allclose((a0[0] + a0[2]) / 2, 4.0, atol=1e-4)


def test_ssd_forward_loss_bboxes():
    model = build_detector(ssd_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=300, num_gts=(3,), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = jax.jit(model.apply)(variables, img)
    cls_scores, bbox_preds = preds
    assert cls_scores[0].shape == (1, 38, 38, 4 * 5)  # softmax C+1
    assert cls_scores[1].shape == (1, 19, 19, 6 * 5)

    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    # untrained softmax CE with OHEM 3:1 -> ~4 * log(C+1)
    assert 1.0 < float(losses['loss_cls']) < 30.0
    assert np.isfinite(float(losses['loss_bbox']))

    res = model.get_bboxes(preds)
    assert res.bboxes.shape == (1, 20, 4)


def test_ssd_empty_gt():
    model = build_detector(ssd_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=300, num_gts=(0,), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = model.apply(variables, img)
    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    assert float(losses['loss_bbox']) == 0.0
    # no positives -> no hard negatives kept either -> zero cls loss
    assert np.isfinite(float(losses['loss_cls']))
