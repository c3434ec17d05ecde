"""Sparse R-CNN tests: learned proposals, dynamic conv, set losses."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def sparse_cfg(num_classes=4, num_stages=2, num_proposals=20):
    return dict(
        type='SparseRCNN',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=4),
        rpn_head=dict(type='EmbeddingRPNHead', num_proposals=num_proposals,
                      proposal_feature_channel=64),
        roi_head=dict(type='SparseRoIHead', num_classes=num_classes,
                      num_stages=num_stages, in_channels=64),
        test_cfg=dict(max_per_img=10))


def test_embedding_rpn_learned_proposals():
    from tpudet.models.roi_heads.sparse_roi_head import EmbeddingRPNHead
    head = EmbeddingRPNHead(num_proposals=5, proposal_feature_channel=8)
    vs = head.init(jax.random.PRNGKey(0), (64, 128), 2)
    props, feats = head.apply(vs, (64, 128), 2)
    assert props.shape == (2, 5, 4)
    assert feats.shape == (2, 5, 8)
    # init boxes are the full image (cxcywh all 0.5)
    np.testing.assert_allclose(np.asarray(props[0, 0]), [0, 0, 128, 64],
                               atol=1e-4)


def test_sparse_rcnn_train_and_infer():
    model = build_detector(sparse_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=2, size=64, num_gts=(2, 0), num_classes=4)
    variables = jax.jit(model.init, static_argnames=('method',))(
        jax.random.PRNGKey(0), img, gt_bboxes, gt_labels, gt_valid,
        method='forward_train')
    losses, _ = model.apply(variables, img, gt_bboxes, gt_labels, gt_valid,
                            method='forward_train',
                            mutable=['batch_stats'])
    # per-stage deep supervision
    assert 'loss_cls' in losses and 's0.loss_cls' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # positives exist -> bbox loss nonzero for the image with gts
    assert float(losses['loss_bbox']) > 0

    outputs = model.apply(variables, img)
    cls_logits, boxes = outputs
    assert cls_logits.shape == (2, 20, 4)
    assert boxes.shape == (2, 20, 4)
    res = model.get_bboxes(outputs)
    assert res.bboxes.shape == (2, 10, 4)


def test_sparse_rcnn_gradients():
    model = build_detector(sparse_cfg(num_stages=1, num_proposals=8))
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=64, num_gts=(2,), num_classes=4)
    variables = jax.jit(model.init, static_argnames=('method',))(
        jax.random.PRNGKey(0), img, gt_bboxes, gt_labels, gt_valid,
        method='forward_train')

    def total(params):
        losses, _ = model.apply(
            {'params': params, **{k: v for k, v in variables.items()
                                  if k != 'params'}},
            img, gt_bboxes, gt_labels, gt_valid, method='forward_train',
            mutable=['batch_stats'])
        return sum(v for k, v in losses.items() if 'loss' in k)

    g = jax.grad(total)(variables['params'])
    norms = [float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    # learned proposal boxes/features receive gradients through matching
    rpn_g = g['rpn_head']
    assert float(jnp.sum(jnp.abs(
        rpn_g['init_proposal_features']))) > 0
