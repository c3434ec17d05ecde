"""HTC tests: semantic fusion, mask info flow, interleaved cascade losses."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def htc_cfg(num_classes=3):
    return dict(
        type='HybridTaskCascade',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        rpn_head=dict(type='RPNHead', in_channels=64, feat_channels=64),
        roi_head=dict(type='HTCRoIHead', num_classes=num_classes,
                      in_channels=64, num_samples=16,
                      num_semantic_classes=8),
        train_cfg=dict(rpn_proposal=dict(nms_pre=50, max_per_img=20)),
        test_cfg=dict(rpn=dict(nms_pre=50, max_per_img=20),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=5)))


def test_htc_forward_train_all_losses():
    model = build_detector(htc_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=64, num_gts=(2,), num_classes=3)
    rng = np.random.RandomState(0)
    gfm = jnp.asarray((rng.rand(1, gt_bboxes.shape[1], 28, 28) > 0.4
                       ).astype(np.float32))
    sem = jnp.asarray(rng.randint(0, 8, (1, 8, 8)).astype(np.int32))
    variables = jax.jit(model.init, static_argnames=('method',))(
        jax.random.PRNGKey(0), img, gt_bboxes, gt_labels, gt_valid, gfm,
        sem, method='forward_train')
    losses, _ = model.apply(variables, img, gt_bboxes, gt_labels, gt_valid,
                            gfm, sem, method='forward_train',
                            mutable=['batch_stats'])
    for s in range(3):
        assert np.isfinite(float(losses[f'loss_cls_s{s}'])), s
        assert np.isfinite(float(losses[f'loss_mask_s{s}'])), s
    assert np.isfinite(float(losses['loss_semantic_seg']))
    # mask info flow convs exist from stage 1 on
    assert 'mask_info0' in variables['params']['roi_head']
    assert 'semantic_head' in variables['params']['roi_head']


def test_htc_inference_path():
    model = build_detector(htc_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=64, num_gts=(2,), num_classes=3)
    rng = np.random.RandomState(0)
    gfm = jnp.asarray((rng.rand(1, gt_bboxes.shape[1], 28, 28) > 0.4
                       ).astype(np.float32))
    variables = jax.jit(model.init, static_argnames=('method',))(
        jax.random.PRNGKey(0), img, gt_bboxes, gt_labels, gt_valid, gfm,
        method='forward_train')
    outputs = model.apply(variables, img)
    res = model.get_bboxes(outputs)
    assert res.bboxes.shape == (1, 5, 4)
    assert np.isfinite(np.asarray(res.scores)).all()
