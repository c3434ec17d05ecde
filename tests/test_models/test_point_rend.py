"""PointRend: coarse head, point head, point sampling, subdivision."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector
from tpudet.models.roi_heads.point_rend_roi_head import point_sample_map

from .test_forward import demo_inputs


def pr_cfg():
    return dict(
        type='PointRend',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        rpn_head=dict(type='RPNHead', in_channels=64, feat_channels=64),
        roi_head=dict(type='PointRendRoIHead', num_classes=3,
                      in_channels=64, num_samples=32,
                      max_num_point_rois=8, num_points=32,
                      subdivision_steps=2, subdivision_num_points=64),
        train_cfg=dict(rpn_proposal=dict(nms_pre=100, max_per_img=50)),
        test_cfg=dict(rpn=dict(nms_pre=100, max_per_img=50),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=8)))


def test_point_sample_map_bilinear():
    feat = jnp.arange(16, dtype=jnp.float32).reshape(4, 4, 1)
    # center of pixel (1, 2) -> value row1 col2 = 6
    xy = jnp.asarray([[(2 + 0.5) / 4, (1 + 0.5) / 4]])
    v = point_sample_map(feat, xy)
    np.testing.assert_allclose(np.asarray(v), [[6.0]], atol=1e-5)
    # halfway between pixel (0,0) and (0,1) -> 0.5
    xy = jnp.asarray([[0.25, 0.125]])
    v = point_sample_map(feat, xy)
    np.testing.assert_allclose(np.asarray(v), [[0.5]], atol=1e-5)


def test_point_rend_train_and_masks():
    model = build_detector(pr_cfg())
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
    for k in ('loss_rpn_cls', 'loss_cls', 'loss_mask', 'loss_point'):
        assert np.isfinite(float(losses[k])), k
    # all-ones gt masks -> untrained BCE near log(2)
    np.testing.assert_allclose(float(losses['loss_point']), np.log(2),
                               atol=0.4)

    outputs = jax.jit(model.apply)(variables, img)
    res = model.get_bboxes(outputs)
    masks = model.apply(variables, img, res.bboxes, res.valid, res.labels,
                        method='predict_masks')
    # 7 * 2**2 = 28 with subdivision_steps=2
    assert masks.shape == (1, 8, 28, 28)
    assert np.isfinite(np.asarray(masks)).all()
    assert float(jnp.max(masks)) <= 1.0 and float(jnp.min(masks)) >= 0.0
