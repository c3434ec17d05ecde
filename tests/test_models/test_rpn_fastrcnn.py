"""Proposal-only RPN detector, FastRCNN (precomputed proposals),
RetinaSepBNHead, DetectoRS-ResNeXt."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector, build_head, build_backbone

from .test_forward import demo_inputs


def test_rpn_detector():
    model = build_detector(dict(
        type='RPN',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        rpn_head=dict(type='RPNHead', in_channels=64, feat_channels=64),
        test_cfg=dict(rpn=dict(nms_pre=200, max_per_img=50,
                               nms=dict(iou_threshold=0.7)))))
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(3,), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = jax.jit(model.apply)(variables, img)
    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    assert np.isfinite(float(losses['loss_rpn_cls']))
    props, scores, labels, valid = model.get_bboxes(preds)
    assert props.shape == (1, 50, 4)
    assert labels.shape == scores.shape == valid.shape == (1, 50)
    assert bool(jnp.any(valid))


def test_fast_rcnn():
    model = build_detector(dict(
        type='FastRCNN',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        roi_head=dict(type='StandardRoIHead', num_classes=4,
                      in_channels=64, num_samples=64),
        test_cfg=dict(rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=20))))
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(3,), num_classes=4)
    rng = np.random.RandomState(0)
    xy = rng.rand(1, 40, 2).astype(np.float32) * 64
    wh = rng.rand(1, 40, 2).astype(np.float32) * 48 + 8
    proposals = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    prop_valid = jnp.ones((1, 40), bool)

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), img, proposals, prop_valid)
    outputs = jax.jit(model.apply)(variables, img, proposals, prop_valid)
    res = model.get_bboxes(outputs)
    assert res.bboxes.shape == (1, 20, 4)

    losses, _ = model.apply(variables, img, proposals, prop_valid,
                            gt_bboxes, gt_labels, gt_valid,
                            method='forward_train',
                            mutable=['batch_stats'])
    assert np.isfinite(float(losses['loss_cls']))
    # untrained CE near log(C+1); few valid rois -> loose tolerance
    np.testing.assert_allclose(float(losses['loss_cls']), np.log(5),
                               atol=0.6)


def test_retina_sepbn_head_shares_convs_across_levels():
    head = build_head(dict(type='RetinaSepBNHead', num_classes=4,
                           in_channels=32, feat_channels=32,
                           stacked_convs=2, num_ins=5))
    feats = tuple(jnp.zeros((1, s, s, 32)) for s in (16, 8, 4, 2, 1))
    variables = head.init(jax.random.PRNGKey(0), feats)
    cls_scores, bbox_preds = head.apply(variables, feats)
    assert cls_scores[0].shape == (1, 16, 16, 9 * 4)
    assert bbox_preds[0].shape == (1, 16, 16, 36)
    params = variables['params']
    # one shared conv kernel set, but per-level BN
    assert 'cls_conv0' in params and 'cls_conv0_l0' not in params
    assert 'cls_bn0_l0' in params and 'cls_bn0_l4' in params
    # loss path inherited from RetinaHead works on these shapes
    _, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(2,), num_classes=4)
    losses = head.loss((cls_scores, bbox_preds), gt_bboxes, gt_labels,
                       gt_valid)
    assert np.isfinite(float(losses['loss_cls']))


def test_detectors_resnext_grouped_width():
    bb = build_backbone(dict(type='DetectoRSResNeXt', depth=50, groups=4,
                             base_width=4, out_indices=[0, 1, 2, 3]))
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(bb.init)(jax.random.PRNGKey(0), x)
    outs = jax.jit(bb.apply)(variables, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
    # grouped conv2 kernel: in-channels divided by groups
    k = variables['params']['layer1_0']['conv2']['kernel']
    width = int(64 * (4 / 64.)) * 4  # 16
    assert k.shape == (3, 3, width // 4, width)
