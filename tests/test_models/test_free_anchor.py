"""FreeAnchor tests: bag construction and positive/negative losses."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def free_anchor_cfg(num_classes=5):
    return dict(
        type='RetinaNet',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1, num_outs=5,
                  add_extra_convs='on_input'),
        bbox_head=dict(type='FreeAnchorRetinaHead', num_classes=num_classes,
                       in_channels=32, feat_channels=32, stacked_convs=1,
                       pre_anchor_topk=8),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=20))


def test_free_anchor_losses_finite_and_positive():
    model = build_detector(free_anchor_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=2, size=128, num_gts=(3, 1), num_classes=5)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = jax.jit(lambda v, x: model.apply(v, x))(variables, img)
    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    pos = float(losses['positive_bag_loss'])
    neg = float(losses['negative_bag_loss'])
    assert np.isfinite(pos) and pos > 0
    assert np.isfinite(neg) and neg > 0
    assert float(losses['num_gts']) == 2.0


def test_free_anchor_gradients_flow():
    model = build_detector(free_anchor_cfg(num_classes=3))
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=64, num_gts=(2,), num_classes=3)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)

    def total(params):
        preds = model.apply({'params': params, **{
            k: v for k, v in variables.items() if k != 'params'}}, img)
        losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
        return losses['positive_bag_loss'] + losses['negative_bag_loss']

    g = jax.grad(total)(variables['params'])
    leaves = jax.tree.leaves(g)
    norms = [float(jnp.sum(jnp.abs(l))) for l in leaves]
    assert all(np.isfinite(n) for n in norms)
    assert sum(norms) > 0  # gradients reach the towers


def test_free_anchor_empty_gt():
    model = build_detector(free_anchor_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=64, num_gts=(0,), num_classes=5)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = model.apply(variables, img)
    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    assert float(losses['positive_bag_loss']) == 0.0
    assert np.isfinite(float(losses['negative_bag_loss']))
