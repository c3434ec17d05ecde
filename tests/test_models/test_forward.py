"""Detector forward/loss smoke tests (reference strategy:
tests/test_models/test_forward.py — build from config, random inputs,
empty-gt batches as a standard case)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpudet.models.builder import build_detector


def demo_inputs(batch=2, size=64, num_gts=(3, 0), num_classes=80, seed=0):
    """Random image + padded random gt boxes; second image empty by
    default (the reference's standard corner case)."""
    rng = np.random.RandomState(seed)
    img = rng.rand(batch, size, size, 3).astype(np.float32)
    g_max = max(max(num_gts), 1)
    gt_bboxes = np.zeros((batch, g_max, 4), np.float32)
    gt_labels = np.zeros((batch, g_max), np.int32)
    gt_valid = np.zeros((batch, g_max), bool)
    for i, n in enumerate(num_gts):
        xy = rng.rand(n, 2) * size * 0.6
        wh = rng.rand(n, 2) * size * 0.3 + 8
        gt_bboxes[i, :n] = np.concatenate([xy, np.minimum(xy + wh, size)], -1)
        gt_labels[i, :n] = rng.randint(0, num_classes, n)
        gt_valid[i, :n] = True
    return (jnp.asarray(img), jnp.asarray(gt_bboxes), jnp.asarray(gt_labels),
            jnp.asarray(gt_valid))


def v4s_cfg(num_classes=80):
    return dict(
        type='SingleStageDetector',
        backbone=dict(type='DarknetCSP', scale='v4s5p', out_indices=[3, 4, 5]),
        neck=dict(type='YOLOV4Neck', in_channels=[128, 256, 256],
                  out_channels=[128, 256, 512], csp_repetition=1),
        bbox_head=dict(type='YOLOCSPHead', num_classes=num_classes,
                       in_channels=[128, 256, 512]),
        test_cfg=dict(min_bbox_size=0, nms_pre=512, score_thr=0.001,
                      nms=dict(type='nms', iou_threshold=0.65),
                      max_per_img=30))


def v5s_cfg():
    return dict(
        type='SingleStageDetector',
        backbone=dict(type='DarknetCSP', scale='v5s5p', out_indices=[2, 3, 4]),
        neck=dict(type='YOLOV5Neck', in_channels=[128, 256, 512],
                  out_channels=[128, 256, 512], csp_repetition=1),
        bbox_head=dict(type='YOLOCSPHead', num_classes=80,
                       in_channels=[128, 256, 512]),
        test_cfg=dict(nms_pre=512, score_thr=0.001,
                      nms=dict(type='nms', iou_threshold=0.65),
                      max_per_img=30))


@pytest.mark.parametrize('cfg_fn', [v4s_cfg, v5s_cfg])
def test_detector_forward_loss_and_bboxes(cfg_fn):
    model = build_detector(cfg_fn())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    pred_maps = jax.jit(model.apply)(variables, img)
    assert len(pred_maps) == 3
    for p, stride in zip(pred_maps, (8, 16, 32)):
        assert p.shape == (2, 64 // stride, 64 // stride, 3 * 85)

    losses = model.loss(pred_maps, gt_bboxes, gt_labels, gt_valid)
    for k in ('loss_cls', 'loss_conf', 'loss_bbox'):
        v = float(losses[k])
        assert np.isfinite(v) and v >= 0, (k, v)
    assert float(losses['loss_conf']) > 0

    res = model.get_bboxes(pred_maps)
    assert res.bboxes.shape == (2, 30, 4)
    assert res.scores.shape == (2, 30)


def test_empty_gt_batch_loss_finite():
    model = build_detector(v4s_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(num_gts=(0, 0))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    pred_maps = model.apply(variables, img)
    losses = model.loss(pred_maps, gt_bboxes, gt_labels, gt_valid)
    assert float(losses['loss_bbox']) == 0.0
    assert float(losses['loss_cls']) == 0.0
    assert np.isfinite(float(losses['loss_conf']))
    assert float(losses['num_gts']) == 0.0


def test_loss_is_differentiable():
    model = build_detector(v4s_cfg(num_classes=4))
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=64, num_gts=(2,), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)

    def loss_fn(params):
        pred_maps = model.apply({'params': params,
                                 'batch_stats': variables['batch_stats']},
                                img, train=True,
                                mutable=['batch_stats'])[0]
        losses = model.loss(pred_maps, gt_bboxes, gt_labels, gt_valid)
        return losses['loss_cls'] + losses['loss_conf'] + losses['loss_bbox']

    grads = jax.grad(loss_fn)(variables['params'])
    gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_head_bias_priors():
    """Objectness bias init must encode the 8-objects-per-640-image prior
    (reference yolocsp_head.py:187-201)."""
    import math
    model = build_detector(v4s_cfg())
    img = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    head_params = variables['params']['bbox_head']
    for lvl, stride in enumerate((8, 16, 32)):
        bias = np.asarray(head_params[f'conv_pred{lvl}']['bias'])
        b = bias.reshape(3, 85)
        expected_obj = math.log(8 / (640 / stride)**2)
        np.testing.assert_allclose(b[:, 4], expected_obj, rtol=1e-5)
        expected_cls = math.log(0.6 / (80 - 0.99))
        np.testing.assert_allclose(b[:, 5:], expected_cls, rtol=1e-5)
        np.testing.assert_allclose(b[:, :4], 0.0)
