"""YOLACT tests: protonet, coeff decode, mask/segm losses, fast NMS path."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def yolact_cfg(num_classes=3):
    return dict(
        type='YOLACT',
        backbone=dict(type='ResNet', depth=18, out_indices=[1, 2, 3]),
        neck=dict(type='FPN', in_channels=[128, 256, 512], out_channels=64,
                  start_level=0, num_outs=5, add_extra_convs='on_input'),
        bbox_head=dict(type='YOLACTHead', num_classes=num_classes,
                       in_channels=64, feat_channels=64, num_protos=8),
        test_cfg=dict(score_thr=0.05,
                      nms=dict(type='fast_nms', iou_threshold=0.5),
                      max_per_img=10, nms_pre=200))


def _inputs(num_classes=3):
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(2,), num_classes=num_classes)
    rng = np.random.RandomState(0)
    gfm = jnp.asarray((rng.rand(1, gt_bboxes.shape[1], 28, 28) > 0.4
                       ).astype(np.float32))
    return img, gt_bboxes, gt_labels, gt_valid, gfm


def test_yolact_forward_train_losses():
    model = build_detector(yolact_cfg())
    img, gt_bboxes, gt_labels, gt_valid, gfm = _inputs()
    variables = jax.jit(model.init, static_argnames=('method',))(
        jax.random.PRNGKey(0), img, gt_bboxes, gt_labels, gt_valid, gfm,
        method='forward_train')
    losses, _ = model.apply(variables, img, gt_bboxes, gt_labels, gt_valid,
                            gfm, method='forward_train',
                            mutable=['batch_stats'])
    for k in ('loss_cls', 'loss_bbox', 'loss_mask', 'loss_segm'):
        assert np.isfinite(float(losses[k])), k
    assert float(losses['loss_mask']) > 0
    # protonet + segm head params exist
    assert 'protonet' in variables['params']
    assert 'segm_head' in variables['params']


def test_yolact_inference_masks():
    model = build_detector(yolact_cfg())
    img, gt_bboxes, gt_labels, gt_valid, gfm = _inputs()
    variables = jax.jit(model.init, static_argnames=('method',))(
        jax.random.PRNGKey(0), img, gt_bboxes, gt_labels, gt_valid, gfm,
        method='forward_train')
    outputs = model.apply(variables, img)
    preds, protos, segm = outputs
    assert protos.shape == (1, 32, 32, 8)  # P3 (stride 4 after 2x up)
    assert segm.shape == (1, 16, 16, 3)

    res = model.get_bboxes(outputs)
    assert res.bboxes.shape == (1, 10, 4)
    res2, masks = model.predict_masks(outputs)
    assert masks.shape == (1, 10, 28, 28)
    m = np.asarray(masks)
    assert ((m >= 0) & (m <= 1)).all()
