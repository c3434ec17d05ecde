"""PISA (ISR-P + CARL) and LD (localization distillation) tests."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector
from tpudet.models.dense_heads.pisa_heads import (carl_weights,
                                                  isr_p_weights)

from .test_forward import demo_inputs


def test_isr_p_ranks_by_iou():
    # 3 positives of the same class/gt with increasing IoU: higher IoU ->
    # lower rank -> larger weight
    ious = jnp.asarray([0.5, 0.7, 0.9, 0.0])
    labels = jnp.asarray([1, 1, 1, 0])
    gts = jnp.asarray([0, 0, 0, 99])
    pos = jnp.asarray([True, True, True, False])
    w = np.asarray(isr_p_weights(ious, labels, gts, pos, k=2.0, bias=0.0))
    assert w[2] > w[1] > w[0]
    assert w[3] == 1.0  # non-positive untouched
    # best sample gets full weight (rank 0 -> (max/max)^k = 1)
    np.testing.assert_allclose(w[2], 1.0)


def test_carl_weights_normalized():
    scores = jnp.asarray([0.9, 0.1, 0.5, 0.0])
    pos = jnp.asarray([True, True, True, False])
    w = np.asarray(carl_weights(scores, pos, k=1.0, bias=0.2))
    assert w[3] == 0.0
    np.testing.assert_allclose(w.sum(), 3.0, rtol=1e-5)
    assert w[0] > w[1]  # confident sample gets larger reg weight


def pisa_cfg(num_classes=4):
    return dict(
        type='PISARetinaNet',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1, num_outs=5,
                  add_extra_convs='on_input'),
        bbox_head=dict(type='PISARetinaHead', num_classes=num_classes,
                       in_channels=32, feat_channels=32, stacked_convs=1),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=10))


def test_pisa_retina_losses():
    model = build_detector(pisa_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=2, size=128, num_gts=(3, 0), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = model.apply(variables, img)
    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    for k in ('loss_cls', 'loss_bbox', 'loss_carl'):
        assert np.isfinite(float(losses[k])), k
    assert float(losses['loss_carl']) > 0


def test_pisa_ssd_losses():
    model = build_detector(dict(
        type='SSD',
        backbone=dict(type='SSDVGG', input_size=300),
        bbox_head=dict(type='PISASSDHead', num_classes=4,
                       in_channels=[512, 1024, 512, 256, 256, 256]),
        test_cfg=dict(score_thr=0.02,
                      nms=dict(type='nms', iou_threshold=0.45),
                      max_per_img=10)))
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=300, num_gts=(2,), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = model.apply(variables, img)
    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    for k in ('loss_cls', 'loss_bbox', 'loss_carl'):
        assert np.isfinite(float(losses[k])), k


def ld_cfg(num_classes=4):
    small_bk = dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3])
    neck = dict(type='FPN', in_channels=[64, 128, 256, 512],
                out_channels=32, start_level=1, num_outs=5,
                add_extra_convs='on_input')
    return dict(
        type='KnowledgeDistillationSingleStageDetector',
        backbone=small_bk,
        neck=neck,
        bbox_head=dict(type='LDHead', num_classes=num_classes,
                       in_channels=32, feat_channels=32, stacked_convs=1),
        teacher_backbone=small_bk,
        teacher_neck=neck,
        teacher_bbox_head=dict(type='GFLHead', num_classes=num_classes,
                               in_channels=32, feat_channels=32,
                               stacked_convs=1),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=10))


def test_ld_distillation_losses():
    from tpudet.models.builder import build_backbone, build_head, build_neck
    cfg = ld_cfg()
    from tpudet.registry import DETECTORS
    model = DETECTORS.get('KnowledgeDistillationSingleStageDetector')(
        backbone=build_backbone(cfg['backbone']),
        neck=build_neck(cfg['neck']),
        bbox_head=build_head(cfg['bbox_head']),
        teacher_backbone=build_backbone(cfg['teacher_backbone']),
        teacher_neck=build_neck(cfg['teacher_neck']),
        teacher_bbox_head=build_head(cfg['teacher_bbox_head']),
        test_cfg=cfg['test_cfg'])
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(2,), num_classes=4)
    variables = jax.jit(model.init, static_argnames=('method',))(
        jax.random.PRNGKey(0), img, gt_bboxes, gt_labels, gt_valid,
        method='forward_train')
    losses, _ = model.apply(variables, img, gt_bboxes, gt_labels, gt_valid,
                            method='forward_train',
                            mutable=['batch_stats'])
    for k in ('loss_cls', 'loss_bbox', 'loss_dfl', 'loss_ld'):
        assert np.isfinite(float(losses[k])), k
    assert float(losses['loss_ld']) >= 0

    # teacher receives no gradient
    def total(params):
        ls, _ = model.apply(
            {'params': params, **{k: v for k, v in variables.items()
                                  if k != 'params'}},
            img, gt_bboxes, gt_labels, gt_valid, method='forward_train',
            mutable=['batch_stats'])
        return sum(v for k, v in ls.items() if 'loss' in k)

    g = jax.grad(total)(variables['params'])
    t_norm = sum(float(jnp.sum(jnp.abs(l)))
                 for l in jax.tree.leaves(g['teacher_backbone']))
    s_norm = sum(float(jnp.sum(jnp.abs(l)))
                 for l in jax.tree.leaves(g['backbone']))
    assert t_norm == 0.0
    assert s_norm > 0.0
