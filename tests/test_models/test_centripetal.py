"""CentripetalNet: guiding/centripetal shifts, geometric pair matching."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector

from .test_forward import demo_inputs


def centripetal_cfg():
    return dict(
        type='CentripetalNet',
        backbone=dict(type='HourglassNet', downsample_times=3,
                      num_stacks=2, stage_channels=[16, 16, 24, 32],
                      stage_blocks=[1, 1, 1, 1], feat_channel=16),
        neck=None,
        bbox_head=dict(type='CentripetalHead', num_classes=4,
                       in_channels=16, num_feat_levels=2),
        test_cfg=dict(corner_topk=20, num_dets=50, dist_thr=0.5,
                      score_thr=0.05, iou_thr=0.5, max_per_img=10))


def test_centripetal_forward_loss_decode():
    model = build_detector(centripetal_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=64, num_gts=(3,), num_classes=4)
    variables = model.init(jax.random.PRNGKey(0), img)
    preds, _ = model.apply(variables, img, True, mutable=['batch_stats'])
    assert len(preds) == 8  # heat/off/guide/centri x tl/br
    assert preds[4][0].shape[-1] == 2  # guiding shift channels

    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    for k in ('loss_heatmap', 'loss_offset', 'loss_guiding',
              'loss_centripetal'):
        assert np.isfinite(float(losses[k])), k
    assert float(losses['loss_centripetal']) > 0

    res = model.get_bboxes(preds)
    assert res.bboxes.shape == (1, 10, 4)
    assert np.isfinite(np.asarray(res.bboxes)).all()


def test_centripetal_shift_targets():
    from tpudet.models.dense_heads import CentripetalHead
    head = CentripetalHead(num_classes=2, in_channels=16)
    gts = jnp.asarray([[8., 8., 40., 24.]])  # center (24, 16)
    valid = jnp.ones((1,), bool)
    tl_g, br_g, tl_c, br_c, tl_m, br_m = head._shift_targets_single(
        gts, valid, (16, 16), 0.25)  # ratio 1/4
    # tl corner cell (2, 2); center (6, 4) -> guiding (4, 2)
    np.testing.assert_allclose(np.asarray(tl_g[2, 2]), [4., 2.], atol=1e-5)
    # centripetal log(center - corner) = log(4), log(2)
    np.testing.assert_allclose(np.asarray(tl_c[2, 2]),
                               [np.log(4.), np.log(2.)], atol=1e-5)
    assert bool(tl_m[2, 2]) and bool(br_m[6, 10])
