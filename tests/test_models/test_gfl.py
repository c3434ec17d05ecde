"""GFL head tests (quality focal + distribution regression)."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def gfl_cfg(num_classes=5):
    return dict(
        type='GFL',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, start_level=1,
                  add_extra_convs='on_input', num_outs=5),
        bbox_head=dict(type='GFLHead', num_classes=num_classes,
                       in_channels=64, feat_channels=64, stacked_convs=1,
                       reg_max=8),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=20))


def test_gfl_forward_loss_bboxes():
    model = build_detector(gfl_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=2, size=128, num_gts=(3, 0), num_classes=5)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = jax.jit(model.apply)(variables, img)
    cls_scores, reg_logits = preds
    assert cls_scores[0].shape == (2, 16, 16, 5)
    assert reg_logits[0].shape == (2, 16, 16, 4 * 9)

    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    for k in ('loss_cls', 'loss_bbox', 'loss_dfl'):
        assert np.isfinite(float(losses[k])), k

    res = model.get_bboxes(preds)
    assert res.bboxes.shape == (2, 20, 4)


def test_gfl_integral_decode():
    from tpudet.models.dense_heads.gfl_head import GFLHead
    head = GFLHead(num_classes=2, reg_max=8)
    # logits strongly peaked at bin 3 -> distance ~3
    logits = np.full((1, 4 * 9), -10., np.float32)
    logits[0, 3::9] = 10.  # wrong stride; set per side properly below
    logits = np.full((1, 4, 9), -10., np.float32)
    logits[:, :, 3] = 10.
    d = np.asarray(head._integral(jnp.asarray(logits.reshape(1, 36))))
    np.testing.assert_allclose(d, [[3., 3., 3., 3.]], atol=1e-3)
