"""CornerNet tests: corner pooling, gaussian targets, Hourglass, e2e."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_backbone, build_detector
from tpudet.models.dense_heads.corner_head import (CornerHead, corner_pool,
                                                   gaussian_radius)

from .test_forward import demo_inputs


def test_corner_pool_directions():
    x = jnp.asarray(np.arange(9, dtype=np.float32).reshape(1, 3, 3, 1))
    # 'bottom': running max downward -> row i = max of rows 0..i
    bot = np.asarray(corner_pool(x, 'bottom'))[0, :, :, 0]
    np.testing.assert_allclose(bot[0], [0, 1, 2])
    np.testing.assert_allclose(bot[2], [6, 7, 8])
    # 'top': row i = max of rows i..end
    top = np.asarray(corner_pool(x, 'top'))[0, :, :, 0]
    np.testing.assert_allclose(top[0], [6, 7, 8])
    # 'right': col j = max of cols 0..j ; 'left': max of cols j..end
    right = np.asarray(corner_pool(x, 'right'))[0, 0, :, 0]
    np.testing.assert_allclose(right, [0, 1, 2])
    left = np.asarray(corner_pool(x, 'left'))[0, 0, :, 0]
    np.testing.assert_allclose(left, [2, 2, 2])


def test_gaussian_radius_matches_reference_cases():
    # identical box with min_overlap 0.3 -> positive finite radius,
    # growing with box size
    r1 = float(gaussian_radius(10.0, 10.0, 0.3))
    r2 = float(gaussian_radius(40.0, 40.0, 0.3))
    assert 0 < r1 < r2


def test_corner_targets_heatmap_peak_and_offset():
    head = CornerHead(num_classes=3)
    gts = jnp.asarray([[10., 18., 50., 42.]])
    labels = jnp.asarray([1])
    valid = jnp.asarray([True])
    (tl, br, tl_off, br_off, tl_m, br_m, tl_idx, br_idx) = \
        head._targets_single(gts, labels, valid, (16, 16), 0.25)
    tl = np.asarray(tl)
    # tl corner at (10*0.25, 18*0.25) = (2.5, 4.5) -> cell (x=2, y=4)
    assert tl[4, 2, 1] == 1.0
    assert tl[:, :, 0].max() == 0.0  # other classes untouched
    off = np.asarray(tl_off)[4, 2]
    np.testing.assert_allclose(off, [0.5, 0.5], atol=1e-6)
    assert bool(np.asarray(tl_m)[4, 2])
    assert int(np.asarray(tl_idx)[0]) == 4 * 16 + 2


def test_hourglass_shapes():
    model = build_backbone(dict(type='HourglassNet', downsample_times=3,
                                num_stacks=2,
                                stage_channels=(16, 16, 24, 24),
                                stage_blocks=(1, 1, 1, 1), feat_channel=16))
    x = jnp.zeros((1, 64, 64, 3))
    vs = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(vs, x)
    assert len(outs) == 2
    for o in outs:
        assert o.shape == (1, 16, 16, 16)  # stride 4


def cornernet_cfg(num_classes=4):
    return dict(
        type='CornerNet',
        backbone=dict(type='HourglassNet', downsample_times=3, num_stacks=2,
                      stage_channels=(16, 16, 24, 24),
                      stage_blocks=(1, 1, 1, 1), feat_channel=16),
        bbox_head=dict(type='CornerHead', num_classes=num_classes,
                       in_channels=16),
        test_cfg=dict(corner_topk=20, num_dets=50, max_per_img=10,
                      score_thr=0.05,
                      nms=dict(type='soft_nms', iou_threshold=0.5)))


def test_cornernet_forward_loss_bboxes():
    model = build_detector(cornernet_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=2, size=64, num_gts=(2, 0), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = jax.jit(lambda v, x: model.apply(v, x))(variables, img)
    tl_heats = preds[0]
    assert len(tl_heats) == 2  # both stacks supervised
    assert tl_heats[0].shape == (2, 16, 16, 4)

    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    for k in ('loss_heatmap', 'loss_pull', 'loss_push', 'loss_offset'):
        assert np.isfinite(float(losses[k])), k
    assert float(losses['loss_heatmap']) > 0

    res = model.get_bboxes(preds)
    assert res.bboxes.shape == (2, 10, 4)
    # geometric validity: x2 > x1, y2 > y1 wherever valid
    v = np.asarray(res.valid)
    bx = np.asarray(res.bboxes)
    if v.any():
        assert (bx[v][:, 2] >= bx[v][:, 0]).all()


def test_cornernet_empty_gt():
    model = build_detector(cornernet_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=64, num_gts=(0,), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = model.apply(variables, img)
    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    assert float(losses['loss_pull']) == 0.0
    assert float(losses['loss_push']) == 0.0
    assert np.isfinite(float(losses['loss_heatmap']))
