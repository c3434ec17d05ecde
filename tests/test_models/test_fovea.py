"""FoveaBox tests: scale-range assignment, target formulas, forward/loss."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector
from tpudet.models.dense_heads.fovea_head import FoveaHead

from .test_forward import demo_inputs


def fovea_cfg(num_classes=5):
    return dict(
        type='FOVEA',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1, num_outs=5,
                  add_extra_convs='on_input'),
        bbox_head=dict(type='FoveaHead', num_classes=num_classes,
                       in_channels=32, feat_channels=32, stacked_convs=1),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=20))


def test_fovea_level_targets_center_region():
    head = FoveaHead(num_classes=3, strides=(8,), base_edge_list=(16,),
                     scale_ranges=((8, 64),), sigma=0.4)
    # gt 32x32 at (8..40): sqrt area 32, inside range
    gts = jnp.asarray([[8., 8., 40., 40.]])
    labels = jnp.asarray([2])
    valid = jnp.asarray([True])
    lab, tgt, pos = head._level_targets(0, (8, 8), gts, labels, valid)
    lab = np.asarray(lab).reshape(8, 8)
    pos = np.asarray(pos).reshape(8, 8)
    # center cell (x=y=3) must be positive with label 2; far corner is bg
    assert lab[3, 3] == 2
    assert lab[7, 7] == 3  # bg = num_classes
    assert pos[3, 3] and not pos[7, 7]
    # target at the gt center cell: px = 3.5*8 = 28 -> (28-8)/16 = 1.25
    t = np.asarray(tgt).reshape(8, 8, 4)
    np.testing.assert_allclose(t[3, 3], np.log([1.25, 1.25, 0.75, 0.75]),
                               rtol=1e-5)


def test_fovea_scale_range_excludes():
    head = FoveaHead(num_classes=3, strides=(8,), base_edge_list=(16,),
                     scale_ranges=((8, 16),), sigma=0.4)
    gts = jnp.asarray([[0., 0., 64., 64.]])  # sqrt area 64 > 16
    lab, _, pos = head._level_targets(0, (8, 8), gts, jnp.asarray([1]),
                                      jnp.asarray([True]))
    assert not np.asarray(pos).any()


def test_fovea_smaller_gt_wins_overlap():
    head = FoveaHead(num_classes=3, strides=(8,), base_edge_list=(16,),
                     scale_ranges=((4, 128),), sigma=1.0)
    gts = jnp.asarray([[0., 0., 64., 64.], [16., 16., 48., 48.]])
    labels = jnp.asarray([0, 1])
    valid = jnp.asarray([True, True])
    lab, _, _ = head._level_targets(0, (8, 8), gts, labels, valid)
    lab = np.asarray(lab).reshape(8, 8)
    assert lab[4, 4] == 1  # smaller gt overwrites in its region
    assert lab[0, 0] == 0


def test_fovea_forward_loss_bboxes():
    model = build_detector(fovea_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=2, size=128, num_gts=(3, 0), num_classes=5)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = jax.jit(lambda v, x: model.apply(v, x))(variables, img)
    cls_scores, bbox_preds = preds
    assert cls_scores[0].shape == (2, 16, 16, 5)
    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    assert np.isfinite(float(losses['loss_cls']))
    assert np.isfinite(float(losses['loss_bbox']))
    res = model.get_bboxes(preds)
    assert res.bboxes.shape == (2, 20, 4)


def test_fovea_empty_gt():
    model = build_detector(fovea_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(0,), num_classes=5)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = model.apply(variables, img)
    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    assert float(losses['loss_bbox']) == 0.0
    assert np.isfinite(float(losses['loss_cls']))
