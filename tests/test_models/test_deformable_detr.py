"""Deformable DETR: MS deformable attention, deep supervision, refine."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector
from tpudet.models.dense_heads import MSDeformAttention

from .test_forward import demo_inputs


def ddetr_cfg(refine=False):
    return dict(
        type='DeformableDETR',
        backbone=dict(type='ResNet', depth=18, out_indices=[1, 2, 3]),
        neck=None,
        bbox_head=dict(type='DeformableDETRHead', num_classes=4,
                       in_channels=[128, 256, 512], embed_dims=32,
                       num_query=20, num_heads=4,
                       num_encoder_layers=2, num_decoder_layers=2,
                       ffn_dim=64, with_box_refine=refine),
        test_cfg=dict(max_per_img=10))


def test_msdeform_attention_uniform_field():
    """On a constant value field, any sampling returns the constant."""
    attn = MSDeformAttention(embed_dims=8, num_heads=2, num_levels=2,
                             num_points=2)
    q = jnp.zeros((1, 3, 8))
    shapes = [(4, 4), (2, 2)]
    v = jnp.ones((1, 20, 8))
    ref = jnp.full((1, 3, 2), 0.5)
    variables = attn.init(jax.random.PRNGKey(0), q, v, shapes, ref)
    out = attn.apply(variables, q, v, shapes, ref)
    assert out.shape == (1, 3, 8)
    # constant input -> every row identical regardless of offsets
    np.testing.assert_allclose(np.asarray(out[0, 0]),
                               np.asarray(out[0, 1]), atol=1e-5)


def test_deformable_detr_train_and_decode():
    model = build_detector(ddetr_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(3,), num_classes=4)
    variables = model.init(jax.random.PRNGKey(0), img)
    preds, _ = model.apply(variables, img, True, mutable=['batch_stats'])
    cls_all, bbox_all, factor = preds
    assert cls_all.shape == (2, 1, 20, 4)  # sigmoid cls, no bg column
    assert bbox_all.shape == (2, 1, 20, 4)
    assert float(jnp.min(bbox_all)) >= 0 and float(jnp.max(bbox_all)) <= 1

    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    for k in ('loss_cls', 'loss_bbox', 'loss_iou', 'd0.loss_cls'):
        assert np.isfinite(float(losses[k])), k

    res = model.get_bboxes(preds)
    assert res.bboxes.shape == (1, 10, 4)


def test_deformable_detr_box_refine_gradients():
    model = build_detector(ddetr_cfg(refine=True))
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(2,), num_classes=4)
    variables = model.init(jax.random.PRNGKey(0), img)

    def loss_fn(params):
        preds, _ = model.apply(
            {'params': params, **{k: v for k, v in variables.items()
                                  if k != 'params'}},
            img, True, mutable=['batch_stats'])
        losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
        return sum(v for k, v in losses.items() if 'loss' in k)

    grads = jax.grad(loss_fn)(variables['params'])
    g = grads['bbox_head']
    # per-layer reg branches exist and receive gradient
    assert 'reg_branch0_out' in g and 'reg_branch1_out' in g
    total = sum(float(jnp.sum(x.astype(jnp.float32)**2))
                for x in jax.tree.leaves(g))
    assert total > 0
