"""RetinaNet generic-anchor-path tests (reference config 4 in
BASELINE.json: RetinaNet-R50-FPN / focal loss / delta coder path)."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.core.assigners import IGNORE, NEGATIVE, max_iou_assign
from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def retina_cfg(num_classes=6, depth=18):
    return dict(
        type='RetinaNet',
        backbone=dict(type='ResNet', depth=depth, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN',
                  in_channels=[64, 128, 256, 512] if depth in (18, 34) else
                  [256, 512, 1024, 2048],
                  out_channels=64, start_level=1,
                  add_extra_convs='on_input', num_outs=5),
        bbox_head=dict(type='RetinaHead', num_classes=num_classes,
                       in_channels=64, feat_channels=64, stacked_convs=1),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=20))


def test_max_iou_assign_semantics():
    anchors = jnp.asarray(np.array(
        [[0, 0, 10, 10], [20, 20, 30, 30], [0, 0, 9, 11], [100, 100, 110, 110]],
        np.float32))
    gts = jnp.asarray(np.array([[0, 0, 10, 10], [21, 21, 31, 31]],
                               np.float32))
    valid = jnp.asarray([True, True])
    out = np.asarray(max_iou_assign(anchors, gts, valid, 0.5, 0.4, 0.0, True))
    assert out[0] == 0  # exact match
    assert out[1] == 1  # iou ~0.68 >= 0.5
    assert out[3] == NEGATIVE  # no overlap

    # low-quality: a gt with max IoU in (neg, pos) range still claims its
    # best anchor
    gts2 = jnp.asarray(np.array([[0, 0, 10, 20]], np.float32))
    out2 = np.asarray(max_iou_assign(
        anchors, gts2, jnp.asarray([True]), 0.5, 0.4, 0.0, True))
    assert out2[0] == 0  # iou = 0.5 -> pos anyway; best-anchor claim holds

    # no valid gts: all negative
    out3 = np.asarray(max_iou_assign(
        anchors, gts, jnp.asarray([False, False]), 0.5, 0.4, 0.0, True))
    assert (out3 == NEGATIVE).all()


def test_ignore_band():
    anchors = jnp.asarray(np.array([[0, 0, 10, 10]], np.float32))
    # IoU ~0.45: between neg 0.4 and pos 0.5 -> ignore, unless low-quality
    # claims it (it does, as the gt's best anchor). Disable low-quality:
    gts = jnp.asarray(np.array([[0, 0, 10, 22.2]], np.float32))
    out = np.asarray(max_iou_assign(anchors, gts, jnp.asarray([True]),
                                    0.5, 0.4, 0.0, False))
    assert out[0] == IGNORE


def test_retinanet_forward_loss_bboxes():
    model = build_detector(retina_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=2, size=128, num_gts=(3, 0), num_classes=6)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = jax.jit(model.apply)(variables, img)
    cls_scores, bbox_preds = preds
    assert len(cls_scores) == 5 and len(bbox_preds) == 5
    assert cls_scores[0].shape == (2, 16, 16, 9 * 6)
    assert bbox_preds[0].shape == (2, 16, 16, 36)

    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    assert np.isfinite(float(losses['loss_cls']))
    assert np.isfinite(float(losses['loss_bbox']))

    res = model.get_bboxes(preds)
    assert res.bboxes.shape == (2, 20, 4)

    # initial cls prob must be ~0.01 (focal prior bias)
    p = float(jax.nn.sigmoid(cls_scores[0]).mean())
    assert 0.005 < p < 0.02


def test_retinanet_loss_differentiable():
    model = build_detector(retina_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(2,), num_classes=6)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)

    def loss_fn(params):
        preds = model.apply({'params': params,
                             'batch_stats': variables['batch_stats']},
                            img, train=True, mutable=['batch_stats'])[0]
        losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
        return losses['loss_cls'] + losses['loss_bbox']

    grads = jax.jit(jax.grad(loss_fn))(variables['params'])
    gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
