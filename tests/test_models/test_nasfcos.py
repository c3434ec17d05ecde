"""NAS-FCOS: searched FPN cells + DCN head towers."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def nasfcos_cfg():
    return dict(
        type='NASFCOS',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='NASFCOS_FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5, start_level=1),
        bbox_head=dict(type='NASFCOSHead', num_classes=4, in_channels=64,
                       feat_channels=64, gn_groups=8),
        test_cfg=dict(score_thr=0.05, nms=dict(iou_threshold=0.6),
                      max_per_img=20, nms_pre=200))


def test_nasfcos_forward_loss_decode():
    model = build_detector(nasfcos_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=2, size=128, num_gts=(3, 0), num_classes=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds, _ = model.apply(variables, img, True, mutable=['batch_stats'])
    cls_scores, bbox_preds, ctr_preds = preds
    # P3..P7 off a 128px image
    assert [c.shape[1] for c in cls_scores] == [16, 8, 4, 2, 1]
    assert cls_scores[0].shape[-1] == 4
    assert bbox_preds[0].shape[-1] == 4
    assert bool(jnp.all(bbox_preds[0] >= 0))  # exp-decoded distances

    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    for k in ('loss_cls', 'loss_bbox', 'loss_centerness'):
        assert np.isfinite(float(losses[k])), k

    preds_t = jax.jit(model.apply)(variables, img)
    res = model.get_bboxes(preds_t)
    assert res.bboxes.shape == (2, 20, 4)
