"""AutoAssign tests: center prior, pos/neg/center losses, gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def aa_cfg(num_classes=4):
    return dict(
        type='AutoAssign',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1, num_outs=5,
                  add_extra_convs='on_input'),
        bbox_head=dict(type='AutoAssignHead', num_classes=num_classes,
                       in_channels=32, feat_channels=32, stacked_convs=1),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=10))


def test_autoassign_losses_and_prior_gradients():
    model = build_detector(aa_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=2, size=128, num_gts=(3, 0), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = jax.jit(lambda v, x: model.apply(v, x))(variables, img)
    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    for k in ('loss_pos', 'loss_neg', 'loss_center'):
        assert np.isfinite(float(losses[k])), k
    assert float(losses['loss_pos']) > 0

    # the learned center prior receives gradients through the loss
    def total(params):
        p = model.apply({'params': params, **{
            k: v for k, v in variables.items() if k != 'params'}}, img)
        ls = model.loss(p, gt_bboxes, gt_labels, gt_valid)
        return ls['loss_pos'] + ls['loss_neg'] + ls['loss_center']

    g = jax.grad(total)(variables['params'])
    prior_g = g['bbox_head']['center_sigma']
    assert float(jnp.sum(jnp.abs(prior_g))) > 0
    assert np.isfinite(float(jnp.sum(prior_g)))


def test_autoassign_empty_gt():
    model = build_detector(aa_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(0,), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = model.apply(variables, img)
    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    assert float(losses['loss_pos']) == 0.0
    assert np.isfinite(float(losses['loss_neg']))
    res = model.get_bboxes(preds)
    assert res.bboxes.shape == (1, 10, 4)


def test_autoassign_total_loss_gradients_finite():
    """Regression: the negative-loss min-max normalization used a NaN
    masking trick whose VJP poisoned ~10M gradient elements (0 * NaN);
    grads of the FULL loss must be finite."""
    import jax
    import jax.numpy as jnp
    model = build_detector(aa_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(2,), num_classes=4)
    variables = model.init(jax.random.PRNGKey(0), img)
    rest = {k: v for k, v in variables.items() if k != 'params'}

    def f(params):
        preds, _ = model.apply({'params': params, **rest}, img, True,
                               mutable=['batch_stats'])
        losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
        return sum(v for k, v in losses.items() if 'loss' in k)

    g = jax.grad(f)(variables['params'])
    bad = sum(int(jnp.sum(~jnp.isfinite(x))) for x in jax.tree.leaves(g))
    assert bad == 0
