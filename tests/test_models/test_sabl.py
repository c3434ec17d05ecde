"""SABL tests: bucketing coder round-trip, head forward/loss/decode."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.core.bbox import (BucketingBBoxCoder, LegacyDeltaXYWHBBoxCoder,
                              PseudoBBoxCoder)
from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def test_bucketing_coder_roundtrip():
    coder = BucketingBBoxCoder(num_buckets=14, scale_factor=3.0)
    props = jnp.asarray([[100., 100., 200., 180.]])
    gts = jnp.asarray([[110., 105., 190., 170.]])
    labels, cls_w, offsets, off_w = coder.encode(props, gts)
    assert labels.shape == (1, 4, 7)
    # decode from the perfect targets: logits = large * labels
    boxes, conf = coder.decode(props, (labels.reshape(1, -1) * 20.0,
                                       offsets.reshape(1, -1)))
    np.testing.assert_allclose(np.asarray(boxes[0]), np.asarray(gts[0]),
                               atol=0.5)
    assert 0 < float(conf[0]) <= 1

    # ignore-neighbor: the second-nearest bucket has weight 0
    cw = np.asarray(cls_w[0, 0])
    lb = np.asarray(labels[0, 0])
    assert cw.sum() == 6.0  # one of 7 ignored
    assert cw[lb.argmax()] == 1.0


def test_legacy_and_pseudo_coders():
    legacy = LegacyDeltaXYWHBBoxCoder()
    boxes = jnp.asarray([[10., 10., 50., 30.]])
    gts = jnp.asarray([[12., 8., 55., 33.]])
    dec = legacy.decode(boxes, legacy.encode(boxes, gts))
    np.testing.assert_allclose(np.asarray(dec), np.asarray(gts), atol=1e-3)
    pseudo = PseudoBBoxCoder()
    np.testing.assert_allclose(np.asarray(pseudo.decode(boxes, gts)),
                               np.asarray(gts))


def sabl_cfg(num_classes=4):
    return dict(
        type='SABLRetinaNet',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1, num_outs=5,
                  add_extra_convs='on_input'),
        bbox_head=dict(type='SABLRetinaHead', num_classes=num_classes,
                       in_channels=32, feat_channels=32, stacked_convs=1),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=10))


def test_sabl_forward_loss_decode():
    model = build_detector(sabl_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=2, size=128, num_gts=(3, 0), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = jax.jit(lambda v, x: model.apply(v, x))(variables, img)
    cls_scores, bucket_cls, bucket_reg = preds
    assert bucket_cls[0].shape == (2, 16, 16, 28)  # 4 sides x 7 buckets
    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    for k in ('loss_cls', 'loss_bbox_cls', 'loss_bbox_reg'):
        assert np.isfinite(float(losses[k])), k
    res = model.get_bboxes(preds)
    assert res.bboxes.shape == (2, 10, 4)


def test_sabl_empty_gt():
    model = build_detector(sabl_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(0,), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = model.apply(variables, img)
    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    assert float(losses['loss_bbox_reg']) == 0.0
    assert np.isfinite(float(losses['loss_cls']))
