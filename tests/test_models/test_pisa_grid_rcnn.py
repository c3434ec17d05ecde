"""PISA RoI head (ISR-P + CARL) and Grid R-CNN tests."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector
from tpudet.models.roi_heads import GridHead

from .test_forward import demo_inputs


def pisa_cfg():
    return dict(
        type='FasterRCNN',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        rpn_head=dict(type='RPNHead', in_channels=64, feat_channels=64),
        roi_head=dict(type='PISARoIHead', num_classes=4,
                      in_channels=64, num_samples=64),
        train_cfg=dict(rpn_proposal=dict(nms_pre=200, max_per_img=100)),
        test_cfg=dict(rpn=dict(nms_pre=200, max_per_img=100),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=20)))


def test_pisa_roi_head_losses():
    model = build_detector(pisa_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(3,), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, gt_bboxes, gt_labels, gt_valid,
                            method='forward_train', mutable=['batch_stats'])
    for k in ('loss_cls', 'loss_bbox', 'loss_carl'):
        assert np.isfinite(float(losses[k])), k
    # ISR-P renormalization preserves the positive CE sum, so loss_cls
    # stays near the unweighted softmax CE of an untrained head
    assert 0.5 < float(losses['loss_cls']) < 3.0
    # inference path unchanged from the standard head
    outputs = jax.jit(model.apply)(variables, img)
    res = model.get_bboxes(outputs)
    assert res.bboxes.shape == (1, 20, 4)


def grid_cfg():
    return dict(
        type='GridRCNN',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        rpn_head=dict(type='RPNHead', in_channels=64, feat_channels=64),
        roi_head=dict(type='GridRoIHead', num_classes=4,
                      in_channels=64, num_samples=32, max_num_grid=16),
        train_cfg=dict(rpn_proposal=dict(nms_pre=200, max_per_img=64)),
        test_cfg=dict(rpn=dict(nms_pre=200, max_per_img=64),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=10)))


def test_grid_rcnn_train_and_refine():
    model = build_detector(grid_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(3,), num_classes=4)
    # the grid head only runs in the train path -> init via forward_train
    variables = jax.jit(model.init, static_argnames=('method',))(
        jax.random.PRNGKey(0), img, gt_bboxes, gt_labels, gt_valid,
        method='forward_train')
    losses, _ = model.apply(variables, img, gt_bboxes, gt_labels, gt_valid,
                            method='forward_train', mutable=['batch_stats'])
    for k in ('loss_rpn_cls', 'loss_cls', 'loss_grid'):
        assert np.isfinite(float(losses[k])), k
    assert 'loss_bbox' not in losses  # with_reg=False

    outputs = jax.jit(model.apply)(variables, img)
    res = model.get_bboxes(outputs)
    refined = model.apply(variables, img, res.bboxes, res.valid,
                          method='refine_boxes')
    assert refined.shape == res.bboxes.shape
    assert bool(jnp.all(jnp.isfinite(refined)))


def test_grid_head_targets_and_voting_roundtrip():
    """A heatmap built from the targets of a box votes back ~that box."""
    head = GridHead()
    rois = jnp.asarray([[20., 30., 80., 110.]])
    # gt == roi: grid points at the roi corners/midpoints
    t = head.get_targets(rois, rois, pos_radius=1.0)  # (1, 28, 28, 9)
    assert t.shape == (1, 28, 28, 9)
    assert float(jnp.sum(t)) > 9  # each point marks a small circle
    # use targets as (scaled) logits: argmax lands on the circle centers
    boxes = head.refine_bboxes(rois, t * 10. - 5.)
    np.testing.assert_allclose(np.asarray(boxes[0]), np.asarray(rois[0]),
                               atol=3.0)


def test_grid_head_small_roi_gets_zero_targets():
    head = GridHead()
    rois = jnp.asarray([[10., 10., 11.0, 11.0]])  # expanded side 2 <= 3
    t = head.get_targets(rois, rois)
    assert float(jnp.sum(t)) == 0.0
