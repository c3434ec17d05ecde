"""RepPoints tests: point assigner, moment transform, forward/loss/decode."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.core.assigners import NEGATIVE
from tpudet.models.builder import build_detector
from tpudet.models.dense_heads.reppoints_head import RepPointsHead

from .test_forward import demo_inputs


def reppoints_cfg(num_classes=5):
    return dict(
        type='RepPointsDetector',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1, num_outs=5,
                  add_extra_convs='on_input'),
        bbox_head=dict(type='RepPointsHead', num_classes=num_classes,
                       in_channels=32, feat_channels=32,
                       point_feat_channels=32, stacked_convs=1),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=20))


def test_point_assigner_level_and_distance():
    head = RepPointsHead(num_classes=2, strides=(8, 16, 32, 64, 128))
    sizes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    pts_np, lvl_np, _ = head._points(sizes)
    points = jnp.asarray(pts_np)
    lvl_ids = jnp.asarray(lvl_np)
    # gt with sqrt(wh/scale) mapping to level 3 (stride 8): w=h=32 ->
    # log2(32/4)=3
    gts = jnp.asarray([[40., 40., 72., 72.], [0., 0., 0., 0.]])
    valid = jnp.asarray([True, False])
    out = np.asarray(head._point_assign(points, lvl_ids, gts, valid))
    pos = np.nonzero(out == 0)[0]
    assert len(pos) == 1  # pos_num=1
    # the positive point is the closest stride-8 point to the gt center (56,
    # 56): grid point (56, 56) exists at index 7*16+7
    assert pos[0] == 7 * 16 + 7
    assert (out[out != 0] == NEGATIVE).all()


def test_reppoints_forward_shapes_and_decoded_boxes():
    model = build_detector(reppoints_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=2, size=128, num_gts=(3, 0), num_classes=5)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = jax.jit(lambda v, x: model.apply(v, x))(variables, img)
    cls_scores, init_boxes, refine_boxes = preds
    assert cls_scores[0].shape == (2, 16, 16, 5)
    assert init_boxes[0].shape == (2, 256, 4)
    # boxes must be valid (x2 >= x1) by construction of the moment transform
    bi = np.asarray(init_boxes[0])
    assert (bi[..., 2] >= bi[..., 0]).all()
    assert (bi[..., 3] >= bi[..., 1]).all()

    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    for k in ('loss_cls', 'loss_pts_init', 'loss_pts_refine'):
        assert np.isfinite(float(losses[k])), k

    res = model.get_bboxes(preds)
    assert res.bboxes.shape == (2, 20, 4)


def test_reppoints_gradients_flow_through_dcn():
    model = build_detector(reppoints_cfg(num_classes=2))
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=64, num_gts=(2,), num_classes=2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)

    def total(params):
        preds = model.apply({'params': params, **{
            k: v for k, v in variables.items() if k != 'params'}}, img)
        losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
        return (losses['loss_cls'] + losses['loss_pts_init'] +
                losses['loss_pts_refine'])

    g = jax.grad(total)(variables['params'])
    flat = {'/'.join(map(str, p)): float(jnp.sum(jnp.abs(v)))
            for p, v in jax.tree_util.tree_flatten_with_path(g)[0]}
    assert all(np.isfinite(v) for v in flat.values())
    # init conv gets grads both from its own loss and through the dcn offset
    init_norm = sum(v for k, v in flat.items() if 'pts_init' in k)
    assert init_norm > 0


def test_reppoints_empty_gt():
    model = build_detector(reppoints_cfg())
    img, gt_bboxes, gt_labels, gt_valid = demo_inputs(
        batch=1, size=128, num_gts=(0,), num_classes=5)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    preds = model.apply(variables, img)
    losses = model.loss(preds, gt_bboxes, gt_labels, gt_valid)
    assert float(losses['loss_pts_init']) == 0.0
    assert float(losses['loss_pts_refine']) == 0.0
    assert np.isfinite(float(losses['loss_cls']))
