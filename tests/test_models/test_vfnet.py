"""VFNet tests: star offsets, two-stage regression, varifocal targets."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def vfnet_cfg(num_classes=5):
    return dict(
        type='VFNet',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1, num_outs=5,
                  add_extra_convs='on_input'),
        bbox_head=dict(type='VFNetHead', num_classes=num_classes,
                       in_channels=32, feat_channels=32, stacked_convs=1),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=20))


def test_vfnet_forward_loss_bboxes():
    model = build_detector(vfnet_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=2, size=128, num_gts=(3, 0), num_classes=5)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = jax.jit(lambda v, x: model.apply(v, x))(variables, img)
    cls_scores, bbox_preds, bbox_refine = preds
    assert cls_scores[0].shape == (2, 16, 16, 5)
    assert bbox_preds[0].shape == (2, 16, 16, 4)
    # distances strictly positive (exp-decoded)
    assert float(jnp.min(bbox_preds[0])) > 0
    assert float(jnp.min(bbox_refine[0])) > 0

    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    for k in ('loss_cls', 'loss_bbox', 'loss_bbox_rf'):
        assert np.isfinite(float(losses[k])), k

    res = model.get_bboxes(preds)
    assert res.bboxes.shape == (2, 20, 4)


def test_vfnet_gradients_flow():
    model = build_detector(vfnet_cfg(num_classes=2))
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=64, num_gts=(2,), num_classes=2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)

    def total(params):
        preds = model.apply({'params': params, **{
            k: v for k, v in variables.items() if k != 'params'}}, img)
        losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
        return (losses['loss_cls'] + losses['loss_bbox'] +
                losses['loss_bbox_rf'])

    g = jax.grad(total)(variables['params'])
    norms = [float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(norms) > 0


def test_vfnet_empty_gt():
    model = build_detector(vfnet_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(0,), num_classes=5)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = model.apply(variables, img)
    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    assert float(losses['loss_bbox']) == 0.0
    assert np.isfinite(float(losses['loss_cls']))
