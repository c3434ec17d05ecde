"""DETR tests: transformer shapes, Hungarian matching, losses, decode."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.core.assigners import NEGATIVE, hungarian_assign
from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def detr_cfg(num_classes=5):
    return dict(
        type='DETR',
        backbone=dict(type='ResNet', depth=18, out_indices=[3]),
        bbox_head=dict(type='DETRHead', num_classes=num_classes,
                       in_channels=512, embed_dims=32, num_query=12,
                       num_heads=4, num_encoder_layers=2,
                       num_decoder_layers=2, ffn_dim=64),
        test_cfg=dict(max_per_img=10))


def test_hungarian_assign_optimal():
    # 3 queries, 2 valid gts + 1 padded
    cost = jnp.asarray([[1.0, 9.0, 0.0],
                        [9.0, 1.0, 0.0],
                        [5.0, 5.0, 0.0]])
    valid = jnp.asarray([True, True, False])
    out = np.asarray(hungarian_assign(cost, valid))
    assert out[0] == 0 and out[1] == 1
    assert out[2] == NEGATIVE  # padded gt never matched


def test_hungarian_assign_under_vmap_jit():
    costs = jnp.asarray([[[1.0, 9.0], [9.0, 1.0]],
                         [[9.0, 1.0], [1.0, 9.0]]])
    valids = jnp.asarray([[True, True], [True, False]])
    out = jax.jit(jax.vmap(hungarian_assign))(costs, valids)
    out = np.asarray(out)
    assert list(out[0]) == [0, 1]
    # second image: only gt0 valid; query1 has cost 1 for it
    assert out[1][1] == 0 and out[1][0] == NEGATIVE


def test_detr_forward_loss_bboxes():
    model = build_detector(detr_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=2, size=64, num_gts=(3, 0), num_classes=5)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = jax.jit(lambda v, x: model.apply(v, x))(variables, img)
    cls_all, bbox_all, factor = preds
    assert cls_all.shape == (2, 2, 12, 6)  # (L, B, Q, C+1)
    assert bbox_all.shape == (2, 2, 12, 4)
    assert float(jnp.min(bbox_all)) >= 0 and float(jnp.max(bbox_all)) <= 1
    np.testing.assert_allclose(np.asarray(factor), [64, 64, 64, 64])

    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    # deep supervision: one loss triple per decoder layer
    assert 'loss_cls' in losses and 'd0.loss_cls' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    res = model.get_bboxes(preds)
    assert res.bboxes.shape == (2, 10, 4)
    assert res.scores.shape == (2, 10)
    # boxes decoded back to pixel space
    assert float(jnp.max(res.bboxes)) <= 64.0 + 1e-3


def test_detr_empty_gt():
    model = build_detector(detr_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=64, num_gts=(0,), num_classes=5)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = model.apply(variables, img)
    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    assert float(losses['loss_bbox']) == 0.0
    assert np.isfinite(float(losses['loss_cls']))
