"""YOLOF tests: uniform assigner semantics, head forward/loss/get_bboxes."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.core.assigners import IGNORE, NEGATIVE, uniform_assign
from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def yolof_cfg(num_classes=5):
    return dict(
        type='YOLOF',
        backbone=dict(type='ResNet', depth=18, out_indices=[3]),
        neck=dict(type='DilatedEncoder', in_channels=512, out_channels=64,
                  block_mid_channels=16, num_residual_blocks=2),
        bbox_head=dict(type='YOLOFHead', num_classes=num_classes,
                       in_channels=64),
        test_cfg=dict(nms_pre=200, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=20))


def test_uniform_assign_semantics():
    # 4 anchors on a line; gt sits exactly on anchor 1
    anchors = jnp.asarray([[0., 0., 10., 10.], [20., 0., 30., 10.],
                           [40., 0., 50., 10.], [60., 0., 70., 10.]])
    pred = anchors  # predictions identical to anchors
    gts = jnp.asarray([[20., 0., 30., 10.], [0., 0., 0., 0.]])
    valid = jnp.asarray([True, False])
    out = uniform_assign(pred, anchors, gts, valid, match_times=1,
                         pos_ignore_thr=0.15, neg_ignore_thr=0.7)
    out = np.asarray(out)
    # anchor 1 matches gt 0 with IoU 1.0 >= 0.15 -> positive
    assert out[1] == 0
    # anchor 0 is the 2nd-closest but match_times=1, so not a candidate;
    # its pred IoU with gt is 0 -> negative
    assert out[0] == NEGATIVE
    assert out[2] == NEGATIVE and out[3] == NEGATIVE


def test_uniform_assign_pos_ignore():
    # candidate whose anchor-IoU with the gt is < pos_ignore_thr -> IGNORE
    anchors = jnp.asarray([[0., 0., 10., 10.], [100., 100., 110., 110.]])
    pred = anchors
    gts = jnp.asarray([[40., 0., 50., 10.]])  # overlaps nothing
    valid = jnp.asarray([True])
    out = np.asarray(
        uniform_assign(pred, anchors, gts, valid, 1, 0.15, 0.7))
    # nearest anchor is a candidate but IoU=0 < 0.15 -> ignored
    assert out[0] == IGNORE
    assert out[1] == NEGATIVE


def test_uniform_assign_empty_gt():
    anchors = jnp.asarray([[0., 0., 10., 10.]])
    gts = jnp.zeros((2, 4))
    valid = jnp.asarray([False, False])
    out = np.asarray(uniform_assign(anchors, anchors, gts, valid, 4, .15, .7))
    assert (out == NEGATIVE).all()


def test_yolof_forward_loss_bboxes():
    model = build_detector(yolof_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=2, size=128, num_gts=(3, 0), num_classes=5)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = jax.jit(lambda v, x: model.apply(v, x))(variables, img)
    cls_scores, bbox_preds = preds
    assert cls_scores[0].shape == (2, 4, 4, 5 * 5)  # A=5 anchors x C=5
    assert bbox_preds[0].shape == (2, 4, 4, 5 * 4)
    # implicit-objectness merge keeps scores finite and below 0 at init
    assert np.isfinite(np.asarray(cls_scores[0])).all()

    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    assert np.isfinite(float(losses['loss_cls']))
    assert np.isfinite(float(losses['loss_bbox']))
    assert float(losses['loss_bbox']) > 0  # positives exist

    res = model.get_bboxes(preds)
    assert res.bboxes.shape == (2, 20, 4)


def test_yolof_empty_gt():
    model = build_detector(yolof_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(0,), num_classes=5)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = model.apply(variables, img)
    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    assert float(losses['loss_bbox']) == 0.0
    assert np.isfinite(float(losses['loss_cls']))
