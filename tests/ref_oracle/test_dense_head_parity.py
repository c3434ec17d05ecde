"""Golden decode parity for the generic dense-head families vs the LIVE
reference (FCOS / ATSS / GFL / FoveaBox): random prediction maps through
both implementations' ``get_bboxes`` and compared numerically.

These decode paths are weight-free — they exercise point/anchor grids,
sigmoid scoring, centerness folding, distance / DeltaXYWH / integral-DFL /
exp decode, and img_shape clipping. Reference entry points:
fcos_head.py::_get_bboxes, atss_head.py::_get_bboxes,
gfl_head.py::_get_bboxes, fovea_head.py::_get_bboxes_single.
"""
import numpy as np
import pytest

from . import refbridge

jnp = pytest.importorskip('jax.numpy')

S = 128
STRIDES = (8, 16, 32, 64, 128)
NUM_CLASSES = 4
RNG = np.random.RandomState(7)


def _maps(channels, batch=1, scale=2.0):
    """Random per-level NCHW maps (torch layout)."""
    return [
        (RNG.randn(batch, channels, S // s, S // s) * scale).astype(
            np.float32) for s in STRIDES
    ]


def _to_nhwc(maps):
    return tuple(jnp.asarray(np.transpose(m, (0, 2, 3, 1))) for m in maps)


def _img_metas():
    return [{'scale_factor': 1, 'pad_shape': (S, S, 3),
             'img_shape': (S, S, 3)}]


def _cfg(extra=None):
    mmcv = refbridge.ref_import('mmcv')
    d = dict(nms_pre=-1, deploy_nms_pre=0, min_bbox_size=0, score_thr=0.05,
             nms=dict(type='nms', iou_threshold=0.6), max_per_img=100)
    d.update(extra or {})
    return mmcv.Config(d)


# ---------------------------------------------------------------- fcos
def test_fcos_get_bboxes_matches_reference():
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    ref = heads.FCOSHead(num_classes=NUM_CLASSES, in_channels=1,
                         feat_channels=32, stacked_convs=1,
                         strides=list(STRIDES), test_cfg=_cfg())
    ref.requires_grad_(False)
    cls_maps = _maps(NUM_CLASSES)
    reg_maps = [np.abs(m) * 8 for m in _maps(4)]  # positive distances
    ctr_maps = _maps(1)
    with torch.no_grad():
        ref_boxes, ref_scores, ref_ctr = ref.get_bboxes(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in reg_maps],
            [torch.from_numpy(m) for m in ctr_maps],
            img_metas=_img_metas(), with_nms=False)[0]
    ref_boxes = refbridge.to_numpy(ref_boxes)
    # reference returns raw cls scores (+bg pad) and centerness separately;
    # tpudet folds centerness into the score
    ref_comb = (refbridge.to_numpy(ref_scores)[:, :NUM_CLASSES]
                * refbridge.to_numpy(ref_ctr)[:, None])

    from tpudet.models.dense_heads.fcos_head import FCOSHead
    head = FCOSHead(num_classes=NUM_CLASSES, in_channels=1)
    my_boxes, my_scores = head.get_bboxes(
        (_to_nhwc(cls_maps), _to_nhwc(reg_maps), _to_nhwc(ctr_maps)),
        img_shape=(S, S), with_nms=False)
    np.testing.assert_allclose(np.asarray(my_boxes)[0], ref_boxes,
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(my_scores)[0], ref_comb,
                               atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------- atss
def _anchor_cfg():
    return dict(type='AnchorGenerator', ratios=[1.0], octave_base_scale=8,
                scales_per_octave=1, strides=list(STRIDES))


def test_atss_get_bboxes_matches_reference():
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    ref = heads.ATSSHead(
        num_classes=NUM_CLASSES, in_channels=1, feat_channels=32,
        stacked_convs=1, test_cfg=_cfg(),
        anchor_generator=_anchor_cfg(),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[0.0] * 4,
                        target_stds=[0.1, 0.1, 0.2, 0.2]))
    ref.requires_grad_(False)
    cls_maps = _maps(NUM_CLASSES)
    reg_maps = _maps(4, scale=1.0)  # deltas
    ctr_maps = _maps(1)
    with torch.no_grad():
        ref_boxes, ref_scores, ref_ctr = ref.get_bboxes(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in reg_maps],
            [torch.from_numpy(m) for m in ctr_maps],
            img_metas=_img_metas(), with_nms=False)[0]
    ref_boxes = refbridge.to_numpy(ref_boxes)
    ref_comb = (refbridge.to_numpy(ref_scores)[:, :NUM_CLASSES]
                * refbridge.to_numpy(ref_ctr)[:, None])

    from tpudet.models.dense_heads.atss_head import ATSSHead
    head = ATSSHead(num_classes=NUM_CLASSES, in_channels=1)
    my_boxes, my_scores = head.get_bboxes(
        (_to_nhwc(cls_maps), _to_nhwc(reg_maps), _to_nhwc(ctr_maps)),
        img_shape=(S, S), with_nms=False)
    np.testing.assert_allclose(np.asarray(my_boxes)[0], ref_boxes,
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(my_scores)[0], ref_comb,
                               atol=1e-5, rtol=1e-4)


# ----------------------------------------------------------------- gfl
def test_gfl_get_bboxes_matches_reference():
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    reg_max = 16
    ref = heads.GFLHead(
        num_classes=NUM_CLASSES, in_channels=1, feat_channels=32,
        stacked_convs=1, test_cfg=_cfg(), reg_max=reg_max,
        anchor_generator=_anchor_cfg())
    ref.requires_grad_(False)
    cls_maps = _maps(NUM_CLASSES)
    reg_maps = _maps(4 * (reg_max + 1), scale=1.0)
    with torch.no_grad():
        ref_boxes, ref_scores = ref.get_bboxes(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in reg_maps],
            img_metas=_img_metas(), with_nms=False)[0]
    ref_boxes = refbridge.to_numpy(ref_boxes)
    ref_scores = refbridge.to_numpy(ref_scores)[:, :NUM_CLASSES]

    from tpudet.models.dense_heads.gfl_head import GFLHead
    head = GFLHead(num_classes=NUM_CLASSES, in_channels=1, reg_max=reg_max)
    my_boxes, my_scores = head.get_bboxes(
        (_to_nhwc(cls_maps), _to_nhwc(reg_maps)),
        img_shape=(S, S), with_nms=False)
    np.testing.assert_allclose(np.asarray(my_boxes)[0], ref_boxes,
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(my_scores)[0], ref_scores,
                               atol=1e-5, rtol=1e-4)


# --------------------------------------------------------------- fovea
def test_fovea_get_bboxes_nms_matches_reference():
    """Fovea's reference decode has no with_nms escape — compare the full
    NMS'd detection set at a high score threshold."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    base_edges = (16, 32, 64, 128, 256)
    ref = heads.FoveaHead(num_classes=NUM_CLASSES, in_channels=1,
                          feat_channels=32, stacked_convs=1,
                          strides=list(STRIDES),
                          base_edge_list=list(base_edges),
                          test_cfg=_cfg(dict(score_thr=0.7, nms_pre=1000)))
    ref.requires_grad_(False)
    cls_maps = _maps(NUM_CLASSES)
    reg_maps = _maps(4, scale=0.5)
    with torch.no_grad():
        ref_dets, ref_labels = ref.get_bboxes(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in reg_maps],
            img_metas=_img_metas())[0]
    ref_dets = refbridge.to_numpy(ref_dets)
    ref_labels = refbridge.to_numpy(ref_labels)

    from tpudet.models.dense_heads.fovea_head import FoveaHead
    head = FoveaHead(num_classes=NUM_CLASSES, in_channels=1,
                     strides=STRIDES, base_edge_list=base_edges)
    out = head.get_bboxes(
        (_to_nhwc(cls_maps), _to_nhwc(reg_maps)),
        img_shape=(S, S), score_thr=0.7, iou_thr=0.6, max_per_img=100,
        nms_pre=10**6)
    my_valid = np.asarray(out.valid)[0].astype(bool)
    n_ref = ref_dets.shape[0]
    assert my_valid.sum() == n_ref
    np.testing.assert_allclose(np.asarray(out.bboxes)[0][:n_ref],
                               ref_dets[:, :4], atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.scores)[0][:n_ref],
                               ref_dets[:, 4], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.labels)[0][:n_ref],
                                  ref_labels)


# ----------------------------------------------------------------- rpn
def test_rpn_proposals_match_reference():
    """RPN proposal generation feeds every two-stage model: per-level
    top-k by objectness, DeltaXYWH decode + clip, min-size filter, and
    level-aware NMS (reference rpn_head.py::_get_bboxes)."""
    import torch
    mmcv = refbridge.ref_import('mmcv')
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    strides = (4, 8, 16, 32, 64)
    ref = heads.RPNHead(
        in_channels=1, feat_channels=8,
        anchor_generator=dict(type='AnchorGenerator', scales=[8],
                              ratios=[0.5, 1.0, 2.0],
                              strides=list(strides)),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[0.0] * 4, target_stds=[1.0] * 4),
        test_cfg=mmcv.Config(dict(
            nms_pre=200, max_per_img=100,
            nms=dict(type='nms', iou_threshold=0.7), min_bbox_size=0)))
    ref.requires_grad_(False)
    cls_maps = [
        (RNG.randn(1, 3, S // s, S // s) * 2).astype(np.float32)
        for s in strides
    ]
    reg_maps = [
        (RNG.randn(1, 12, S // s, S // s) * 0.5).astype(np.float32)
        for s in strides
    ]
    with torch.no_grad():
        ref_props = ref.get_bboxes(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in reg_maps],
            img_metas=_img_metas())[0]
    ref_props = refbridge.to_numpy(ref_props)  # (n, 5) score-desc

    from tpudet.models.dense_heads.rpn_head import RPNHead
    head = RPNHead(in_channels=1, strides=strides)
    props, pscores, pvalid = head.get_proposals(
        (_to_nhwc(cls_maps), _to_nhwc(reg_maps)),
        img_shape=(S, S), nms_pre=200, max_num=100, iou_thr=0.7)
    props = np.asarray(props)[0]
    pscores = np.asarray(pscores)[0]
    pvalid = np.asarray(pvalid)[0].astype(bool)

    n_ref = ref_props.shape[0]
    assert pvalid.sum() == n_ref
    np.testing.assert_allclose(props[:n_ref], ref_props[:, :4], atol=1e-3)
    np.testing.assert_allclose(pscores[:n_ref], ref_props[:, 4], atol=1e-5)


# ------------------------------------------------------- two-stage bbox
def test_bbox_head_get_bboxes_matches_reference():
    """Two-stage final decode (reference bbox_head.py::get_bboxes):
    softmax scores (bg column last), per-class DeltaXYWH decode with
    img_shape clipping, multiclass NMS."""
    import torch
    mmcv = refbridge.ref_import('mmcv')
    rh = refbridge.ref_import('mmdet.models.roi_heads.bbox_heads')
    num_classes, P = 4, 64
    ref = rh.BBoxHead(with_avg_pool=True, in_channels=1, roi_feat_size=7,
                      num_classes=num_classes, reg_class_agnostic=False)
    cfg = mmcv.Config(dict(score_thr=0.2,
                           nms=dict(type='nms', iou_threshold=0.5),
                           max_per_img=50))
    xy = RNG.rand(P, 2).astype(np.float32) * 100
    wh = RNG.rand(P, 2).astype(np.float32) * 40 + 8
    rois = np.concatenate([xy, xy + wh], -1)
    cls_logits = (RNG.randn(P, num_classes + 1) * 2).astype(np.float32)
    deltas = (RNG.randn(P, 4 * num_classes) * 0.8).astype(np.float32)
    with torch.no_grad():
        ref_dets, ref_labels = ref.get_bboxes(
            torch.from_numpy(np.concatenate(
                [np.zeros((P, 1), np.float32), rois], -1)),
            torch.from_numpy(cls_logits), torch.from_numpy(deltas),
            img_shape=(S, S, 3), scale_factor=1.0, rescale=False, cfg=cfg)
    ref_dets = refbridge.to_numpy(ref_dets)
    ref_labels = refbridge.to_numpy(ref_labels)

    from tpudet.models.roi_heads.standard_roi_head import StandardRoIHead
    head = StandardRoIHead(num_classes=num_classes, in_channels=1)
    out = head.get_bboxes(
        jnp.asarray(rois)[None], jnp.ones((1, P), bool),
        jnp.asarray(cls_logits)[None], jnp.asarray(deltas)[None],
        score_thr=0.2, iou_thr=0.5, max_per_img=50, img_shape=(S, S))
    valid = np.asarray(out.valid)[0].astype(bool)
    n_ref = ref_dets.shape[0]
    assert valid.sum() == n_ref
    np.testing.assert_allclose(np.asarray(out.bboxes)[0][:n_ref],
                               ref_dets[:, :4], atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.scores)[0][:n_ref],
                               ref_dets[:, 4], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.labels)[0][:n_ref],
                                  ref_labels)


# --------------------------------------------------------------- yolof
def test_yolof_get_bboxes_matches_reference():
    """YOLOF single-level decode (reference yolof_head.py via the shared
    anchor_head.py::_get_bboxes: ctr-clamped DeltaXYWH, img_shape clip)."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    ref = heads.YOLOFHead(
        num_classes=NUM_CLASSES, in_channels=32, reg_decoded_bbox=False,
        anchor_generator=dict(type='AnchorGenerator',
                              ratios=[1.0], scales=[1, 2, 4, 8, 16],
                              strides=[32]),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[.0, .0, .0, .0],
                        target_stds=[1., 1., 1., 1.],
                        add_ctr_clamp=True, ctr_clamp=32),
        test_cfg=_cfg())
    ref.requires_grad_(False)
    hw = S // 32
    cls_map = (RNG.randn(1, 5 * NUM_CLASSES, hw, hw) * 2).astype(np.float32)
    reg_map = (RNG.randn(1, 20, hw, hw) * 1.5).astype(np.float32)
    with torch.no_grad():
        ref_boxes, ref_scores = ref.get_bboxes(
            [torch.from_numpy(cls_map)], [torch.from_numpy(reg_map)],
            img_metas=_img_metas(), with_nms=False)[0]
    ref_boxes = refbridge.to_numpy(ref_boxes)
    ref_scores = refbridge.to_numpy(ref_scores)[:, :NUM_CLASSES]

    from tpudet.models.dense_heads.yolof_head import YOLOFHead
    head = YOLOFHead(num_classes=NUM_CLASSES, in_channels=32)
    my_boxes, my_scores = head.get_bboxes(
        ((jnp.asarray(np.transpose(cls_map, (0, 2, 3, 1))),),
         (jnp.asarray(np.transpose(reg_map, (0, 2, 3, 1))),)),
        img_shape=(S, S), with_nms=False)
    np.testing.assert_allclose(np.asarray(my_boxes)[0], ref_boxes,
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(my_scores)[0], ref_scores,
                               atol=1e-5, rtol=1e-4)


# --------------------------------------------------------------- vfnet
def test_vfnet_get_bboxes_matches_reference():
    """VFNet refined-branch decode (reference vfnet_head.py
    ::_get_bboxes_single: IoU-aware scores, distance decode, clip)."""
    import torch
    heads = refbridge.ref_import('mmdet.models.dense_heads')
    ref = heads.VFNetHead(num_classes=NUM_CLASSES, in_channels=32,
                          feat_channels=32, stacked_convs=1,
                          strides=list(STRIDES), test_cfg=_cfg())
    ref.requires_grad_(False)
    cls_maps = _maps(NUM_CLASSES)
    reg_maps = [np.abs(m) * 4 for m in _maps(4)]      # unused coarse branch
    refine_maps = [np.abs(m) * 8 for m in _maps(4)]   # refined distances
    with torch.no_grad():
        out = ref.get_bboxes(
            [torch.from_numpy(m) for m in cls_maps],
            [torch.from_numpy(m) for m in reg_maps],
            [torch.from_numpy(m) for m in refine_maps],
            img_metas=_img_metas(), with_nms=False)[0]
    ref_boxes = refbridge.to_numpy(out[0])
    ref_scores = refbridge.to_numpy(out[1])[:, :NUM_CLASSES]

    from tpudet.models.dense_heads.vfnet_head import VFNetHead
    head = VFNetHead(num_classes=NUM_CLASSES, in_channels=32)
    my_boxes, my_scores = head.get_bboxes(
        (_to_nhwc(cls_maps), _to_nhwc(reg_maps), _to_nhwc(refine_maps)),
        img_shape=(S, S), with_nms=False)
    np.testing.assert_allclose(np.asarray(my_boxes)[0], ref_boxes,
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(my_scores)[0], ref_scores,
                               atol=1e-5, rtol=1e-4)
