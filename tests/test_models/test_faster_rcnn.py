"""Two-stage (Faster R-CNN) tests: RPN, static roi sampling, RoIAlign
pipeline, end-to-end losses and detections."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def frcnn_cfg(num_classes=4):
    return dict(
        type='FasterRCNN',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        rpn_head=dict(type='RPNHead', in_channels=64, feat_channels=64),
        roi_head=dict(type='StandardRoIHead', num_classes=num_classes,
                      in_channels=64, num_samples=64),
        train_cfg=dict(rpn_proposal=dict(nms_pre=200, max_per_img=100)),
        test_cfg=dict(rpn=dict(nms_pre=200, max_per_img=100),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=20)))


def test_faster_rcnn_inference_and_train(tmp_path):
    model = build_detector(frcnn_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(3,), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)

    outputs = jax.jit(model.apply)(variables, img)
    proposals, prop_valid, cls_logits, deltas = outputs
    assert proposals.shape == (1, 100, 4)
    assert cls_logits.shape == (1, 100, 5)
    assert deltas.shape == (1, 100, 16)
    res = model.get_bboxes(outputs)
    assert res.bboxes.shape == (1, 20, 4)

    losses, _ = model.apply(variables, img, gt_bboxes, gt_labels, gt_valid,
                            method='forward_train', mutable=['batch_stats'])
    for k in ('loss_rpn_cls', 'loss_rpn_bbox', 'loss_cls', 'loss_bbox'):
        assert np.isfinite(float(losses[k])), k
    # untrained RPN objectness BCE ~ log(2); roi CE ~ log(C+1)
    np.testing.assert_allclose(float(losses['loss_rpn_cls']), np.log(2),
                               atol=0.2)
    np.testing.assert_allclose(float(losses['loss_cls']), np.log(5),
                               atol=0.3)


def test_faster_rcnn_gradients_flow_to_both_stages():
    model = build_detector(frcnn_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(2,), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)

    def loss_fn(params):
        losses, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            img, gt_bboxes, gt_labels, gt_valid, method='forward_train',
            mutable=['batch_stats'])
        return sum(v for k, v in losses.items() if k.startswith('loss'))

    grads = jax.jit(jax.grad(loss_fn))(variables['params'])

    def gnorm(tree):
        return sum(float(jnp.sum(g.astype(jnp.float32)**2))
                   for g in jax.tree.leaves(tree))

    assert gnorm(grads['rpn_head']) > 0
    assert gnorm(grads['roi_head']) > 0
    assert gnorm(grads['backbone']) > 0


def test_roi_sampling_includes_gts_and_caps_positives():
    model = build_detector(frcnn_cfg())
    rng = np.random.RandomState(0)
    proposals = jnp.asarray(rng.rand(1, 50, 4).astype(np.float32) * 100)
    prop_valid = jnp.ones((1, 50), bool)
    gts = jnp.asarray(np.array([[[10., 10., 60., 60.],
                                 [70., 70., 110., 100.]]], np.float32))
    gtl = jnp.asarray(np.array([[0, 1]], np.int32))
    gtv = jnp.asarray(np.ones((1, 2), bool))
    rois, sampled, labels, targets, pos = model.roi_head.sample_rois(
        proposals, prop_valid, gts, gtl, gtv)
    # sample size clamps to the available roi count (50 props + 2 gts)
    assert rois.shape == (1, 52, 4)
    assert int(np.asarray(pos).sum()) >= 2  # at least the appended gts
    # positive labels come from the gts
    pos_labels = np.asarray(labels)[np.asarray(pos)]
    assert set(pos_labels.tolist()) <= {0, 1}
    # background label for sampled negatives
    neg_labels = np.asarray(labels)[np.asarray(sampled) & ~np.asarray(pos)]
    assert (neg_labels == 4).all()
