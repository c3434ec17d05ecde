"""PAA tests: 1-D GMM EM, probabilistic reassignment, losses."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector
from tpudet.models.dense_heads.paa_head import gmm_em_1d

from .test_forward import demo_inputs


def test_gmm_em_separates_two_clusters():
    rng = np.random.RandomState(0)
    lo = rng.normal(0.2, 0.02, 10)
    hi = rng.normal(2.0, 0.05, 10)
    x = jnp.asarray(np.concatenate([lo, hi]).astype(np.float32))
    valid = jnp.ones(20, bool)
    means, assign, score = gmm_em_1d(x, valid)
    means = np.asarray(means)
    assert means[0] < means[1]
    assert abs(means[0] - 0.2) < 0.1
    assert abs(means[1] - 2.0) < 0.15
    a = np.asarray(assign)
    assert (a[:10] == 0).all()
    assert (a[10:] == 1).all()


def test_gmm_em_handles_masked_entries():
    x = jnp.asarray([0.1, 0.2, 5.0, 0.0, 0.0])
    valid = jnp.asarray([True, True, True, False, False])
    means, assign, _ = gmm_em_1d(x, valid)
    assert np.isfinite(np.asarray(means)).all()
    assert np.asarray(assign)[2] == 1


def paa_cfg(num_classes=4):
    return dict(
        type='PAA',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1, num_outs=5,
                  add_extra_convs='on_input'),
        bbox_head=dict(type='PAAHead', num_classes=num_classes,
                       in_channels=32, feat_channels=32, stacked_convs=1),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=10))


def test_paa_forward_loss_bboxes():
    model = build_detector(paa_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=2, size=128, num_gts=(3, 0), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = jax.jit(lambda v, x: model.apply(v, x))(variables, img)
    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    for k in ('loss_cls', 'loss_bbox', 'loss_iou'):
        assert np.isfinite(float(losses[k])), k
    assert float(losses['loss_iou']) > 0  # positives got selected
    res = model.get_bboxes(preds)
    assert res.bboxes.shape == (2, 10, 4)


def test_paa_empty_gt():
    model = build_detector(paa_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(0,), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = model.apply(variables, img)
    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    assert float(losses['loss_bbox']) == 0.0
    assert np.isfinite(float(losses['loss_cls']))
