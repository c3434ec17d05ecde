"""YOLOv3 family tests (Darknet-53 + YOLOV3Neck + YOLOV3Head)."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.core.bbox import YOLOBBoxCoder
from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def v3_cfg(num_classes=6):
    return dict(
        type='YOLOV3',
        backbone=dict(type='Darknet', depth=53, out_indices=[3, 4, 5]),
        neck=dict(type='YOLOV3Neck', num_scales=3,
                  in_channels=[1024, 512, 256], out_channels=[128, 64, 32]),
        bbox_head=dict(type='YOLOV3Head', num_classes=num_classes,
                       in_channels=[128, 64, 32],
                       out_channels=[256, 128, 64]),
        test_cfg=dict(nms_pre=128, score_thr=0.05, conf_thr=0.005,
                      nms=dict(type='nms', iou_threshold=0.45),
                      max_per_img=20))


def test_yolo_coder_roundtrip():
    coder = YOLOBBoxCoder()
    anchors = jnp.asarray(np.array([[100., 100., 216., 190.]], np.float32))
    gts = jnp.asarray(np.array([[110., 95., 220., 200.]], np.float32))
    enc = coder.encode(anchors, gts, 32.0)
    dec = YOLOBBoxCoder.decode(anchors, enc, 32.0)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(gts), atol=1e-3)
    # xy targets are valid sigmoid-space values
    assert (np.asarray(enc[..., :2]) > 0).all()
    assert (np.asarray(enc[..., :2]) < 1).all()


def test_yolov3_forward_loss_bboxes():
    model = build_detector(v3_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=2, size=96, num_gts=(3, 0), num_classes=6)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    pred_maps = jax.jit(model.apply)(variables, img)
    # deepest level first: strides (32, 16, 8)
    assert pred_maps[0].shape == (2, 3, 3, 3 * 11)
    assert pred_maps[2].shape == (2, 12, 12, 3 * 11)

    losses = model.loss(pred_maps, gt_bboxes, gt_labels, gt_valid)
    for k in ('loss_cls', 'loss_conf', 'loss_xy', 'loss_wh'):
        assert np.isfinite(float(losses[k])), k
    assert float(losses['loss_conf']) > 0

    res = model.get_bboxes(pred_maps)
    assert res.bboxes.shape == (2, 20, 4)


def test_yolov3_empty_gt():
    model = build_detector(v3_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=2, size=96, num_gts=(0, 0), num_classes=6)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    pred_maps = model.apply(variables, img)
    losses = model.loss(pred_maps, gt_bboxes, gt_labels, gt_valid)
    assert float(losses['loss_cls']) == 0.0
    assert float(losses['loss_xy']) == 0.0
    assert np.isfinite(float(losses['loss_conf']))
