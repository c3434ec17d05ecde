"""SCNet: cascade + semantic fusion + global context + feature relay."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def scnet_cfg():
    return dict(
        type='SCNet',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        rpn_head=dict(type='RPNHead', in_channels=64, feat_channels=64),
        roi_head=dict(type='SCNetRoIHead', num_classes=3, in_channels=64,
                      num_samples=32, num_semantic_classes=8,
                      fc_out_channels=128),
        train_cfg=dict(rpn_proposal=dict(nms_pre=100, max_per_img=50)),
        test_cfg=dict(rpn=dict(nms_pre=100, max_per_img=50),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=8)))


def test_scnet_train_losses_and_masks():
    model = build_detector(scnet_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(2,), num_classes=3)
    g = gt_bboxes.shape[1]
    gfm = jnp.asarray(np.ones((1, g, 16, 16), np.float32))
    seg = jnp.zeros((1, 16, 16), jnp.int32)
    variables = jax.jit(model.init, static_argnames=('method',))(
        jax.random.PRNGKey(0), img, gt_bboxes, gt_labels, gt_valid, gfm,
        seg, method='forward_train')
    losses, _ = model.apply(variables, img, gt_bboxes, gt_labels, gt_valid,
                            gfm, seg, method='forward_train',
                            mutable=['batch_stats'])
    for k in ('loss_rpn_cls', 'loss_cls_s0', 'loss_cls_s1', 'loss_cls_s2',
              'loss_mask', 'loss_glbctx', 'loss_semantic_seg'):
        assert np.isfinite(float(losses[k])), k
    # untrained multi-label glbctx BCE near 3.0 * log(2)
    np.testing.assert_allclose(float(losses['loss_glbctx']),
                               3.0 * np.log(2), rtol=0.3)

    outputs = jax.jit(model.apply)(variables, img)
    res = model.get_bboxes(outputs)
    assert res.bboxes.shape == (1, 8, 4)
    masks = model.apply(variables, img, res.bboxes, res.valid,
                        method='predict_masks')
    assert masks.shape == (1, 8, 28, 28, 3)
    assert np.isfinite(np.asarray(masks)).all()


def test_scnet_glbctx_targets_multilabel():
    from tpudet.models.roi_heads import SCNetRoIHead
    head = SCNetRoIHead(num_classes=3, in_channels=8)
    pred = jnp.zeros((2, 3))
    labels = jnp.asarray([[0, 2, 0], [1, 1, 1]])
    valid = jnp.asarray([[True, True, False], [True, False, False]])
    out = head.glbctx_loss(pred, labels, valid)
    # logits 0 -> BCE log(2) regardless of targets; just finite + weighted
    np.testing.assert_allclose(float(out['loss_glbctx']), 3.0 * np.log(2),
                               rtol=1e-5)
