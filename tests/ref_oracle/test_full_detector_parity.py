"""FULL-detector numeric parity against the LIVE reference.

Round-2 pinned every stage individually (backbone conversion, neck, head
decode, NMS, loss, evaluator); this composes them: the complete reference
detector is built from its shipped config's model/test_cfg
(/root/reference/configs/yolov4/yolov4s_coco_mosaic.py:1-18,
 configs/retinanet/retinanet_r50_fpn_1x_coco.py via its _base_ chain),
its whole weight set converted in execution order, and the SAME
preprocessed batch run through the reference
``SingleStageDetector.simple_test``
(/root/reference/mmdet/models/detectors/single_stage.py:81 ->
 yolocsp_head.py:225 -> core/post_processing/bbox_nms.py:7) and through
tpudet's jitted forward -> decode -> NMS. Final (box, score, label) sets
must be equal.
"""
import numpy as np
import pytest

from . import refbridge

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

RNG = np.random.RandomState(11)


def _convert(flax_model, flax_init_args, torch_model, torch_forward):
    from tpudet.utils.weight_convert import (assign_torch_sequence,
                                             flax_layer_order,
                                             torch_module_sequence)
    order = flax_layer_order(flax_model, *flax_init_args)
    torch_layers = torch_module_sequence(torch_model, torch_forward)
    variables = flax_model.init(jax.random.PRNGKey(0), *flax_init_args)
    return assign_torch_sequence(variables, order, torch_layers)


def _build_ref_detector(model_cfg):
    import torch
    mmcv = refbridge.ref_import('mmcv')
    models = refbridge.ref_import('mmdet.models')
    torch.manual_seed(0)
    cfg = mmcv.ConfigDict(model_cfg)
    ref = models.build_detector(cfg)
    ref.eval()
    # randomize BN running stats so parity also covers stat handling
    torch.manual_seed(1)
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.7, 1.3)
    # spread the head's output distribution so a healthy number of
    # candidates clear score_thr (fresh-init bias priors put nearly all
    # scores below it, which would make the test vacuous)
    torch.manual_seed(2)
    for m in ref.bbox_head.modules():
        if isinstance(m, torch.nn.Conv2d) and m.bias is not None:
            m.bias.data.normal_(-3.0, 1.5)
    return ref


def _ref_dets(ref, x_nchw, img_metas):
    """Run the reference simple_test; flatten per-class results to
    (boxes xyxy, scores, labels) sorted by descending score."""
    import torch
    with torch.no_grad():
        per_class = ref.simple_test(torch.from_numpy(x_nchw), img_metas,
                                    rescale=True)[0]
    boxes, scores, labels = [], [], []
    for c, arr in enumerate(per_class):
        arr = refbridge.to_numpy(arr)
        if arr.size:
            boxes.append(arr[:, :4])
            scores.append(arr[:, 4])
            labels.append(np.full(arr.shape[0], c, np.int64))
    if not boxes:
        return (np.zeros((0, 4)), np.zeros((0,)), np.zeros((0,), np.int64))
    boxes = np.concatenate(boxes)
    scores = np.concatenate(scores)
    labels = np.concatenate(labels)
    order = np.argsort(-scores, kind='stable')
    return boxes[order], scores[order], labels[order]


def _my_dets(out):
    """Flatten tpudet padded BatchDetections (batch of 1) the same way."""
    valid = np.asarray(out.valid)[0].astype(bool)
    boxes = np.asarray(out.bboxes)[0][valid]
    scores = np.asarray(out.scores)[0][valid]
    labels = np.asarray(out.labels)[0][valid]
    order = np.argsort(-scores, kind='stable')
    return boxes[order], scores[order], labels[order]


def _assert_det_sets_equal(mine, ref, candidates, box_atol=5e-3,
                           score_atol=1e-4, max_flips=3):
    """Set equality by greedy geometric matching (rank-aligned comparison
    is NOT valid here: one flipped NMS keep decision shifts every later
    rank). Tolerances, measured on this exact setup:

    - ``box_atol``: accumulated fp divergence between XLA and torch
      through the full network reaches ~1e-3 px on 600-px boxes (299/300
      matched dets: max 1.1e-3, p99 7e-4); 5e-3 keeps headroom while
      staying orders of magnitude below any semantically distinct box.
    - ``max_flips``: hard-NMS keep decisions are fp-sensitive exactly at
      the IoU threshold; a flipped decision swaps which of two candidates
      survives. Each allowed flip must be PROVEN to be a keep-decision
      flip, not a wrong box: the ref det must exist (box within
      ``box_atol``, class score within ``score_atol``) in tpudet's raw
      pre-NMS candidate pool (``candidates`` = the ``with_nms=False``
      output) — i.e. forward+decode produced the detection identically
      and only the suppression decision differed.
    """
    mb, ms, ml = mine
    rb, rs, rl = ref
    if len(candidates) == 3:
        # per-(box, class) candidate triples (two-stage: boxes differ per
        # class); expand to the common (boxes, per-class score) lookup
        cand_boxes, cand_flat_scores, cand_labels = candidates
    else:
        cand_boxes, cand_scores = candidates
        cand_labels = None
    assert len(ms) == len(rs), (len(ms), len(rs))
    assert len(rs) > 10, 'vacuous: almost no detections cleared score_thr'
    # the global score spectrum must agree exactly (sorted, class-blind)
    np.testing.assert_allclose(np.sort(ms)[::-1], np.sort(rs)[::-1],
                               atol=score_atol)
    used = np.zeros(len(ms), bool)
    flips = []
    for i in range(len(rs)):
        cand = np.where((ml == rl[i]) & ~used)[0]
        if len(cand):
            d = np.abs(mb[cand] - rb[i]).max(axis=1)
            k = int(np.argmin(d))
            if d[k] <= box_atol:
                j = cand[k]
                assert abs(ms[j] - rs[i]) <= score_atol, (i, ms[j], rs[i])
                used[j] = True
                continue
        flips.append(i)
    assert len(flips) <= max_flips, \
        f'{len(flips)} unmatched ref dets (>{max_flips}): ' \
        f'{[(float(rs[i]), int(rl[i])) for i in flips[:8]]}'
    for i in flips:
        if cand_labels is not None:
            sel = cand_labels == rl[i]
            d = np.abs(cand_boxes[sel] - rb[i]).max(axis=1)
            near = np.where(d <= box_atol)[0]
            ok = near.size and bool(np.any(
                np.abs(cand_flat_scores[sel][near] - rs[i]) <= score_atol))
        else:
            d = np.abs(cand_boxes - rb[i]).max(axis=1)
            near = np.where(d <= box_atol)[0]
            ok = near.size and bool(np.any(
                np.abs(cand_scores[near, int(rl[i])] - rs[i]) <= score_atol))
        assert ok, (f'ref det score={rs[i]} class={rl[i]} box={rb[i]} is '
                    'absent from the raw candidate pool — a real forward/'
                    'decode deviation, not an NMS tie flip')


@pytest.mark.parametrize('version', ['v4s', 'v5s'])
def test_yolo_full_detector_parity(version):
    """Whole YOLOv4-s / YOLOv5-s: converted weights, reference shipped
    test_cfg (nms_pre=-1 uncapped, score_thr=0.001, iou 0.65, max 300 —
    /root/reference/configs/yolov4/yolov4s_coco_mosaic.py:12-17)."""
    import torch

    test_cfg = dict(min_bbox_size=0, nms_pre=-1, score_thr=0.001,
                    nms=dict(type='nms', iou_threshold=0.65),
                    max_per_img=300)
    nc = 80
    if version == 'v4s':
        ref_model_cfg = dict(
            type='SingleStageDetector',
            backbone=dict(type='DarknetCSP', scale='v4s5p',
                          out_indices=[3, 4, 5]),
            neck=dict(type='YOLOV4Neck', in_channels=[128, 256, 256],
                      out_channels=[128, 256, 512], csp_repetition=1),
            bbox_head=dict(type='YOLOCSPHead', num_classes=nc,
                           in_channels=[128, 256, 512]),
            test_cfg=test_cfg)
        my_model_cfg = dict(ref_model_cfg)
    else:
        ref_model_cfg = dict(
            type='SingleStageDetector',
            backbone=dict(type='DarknetCSP', scale='v5s5p',
                          out_indices=[2, 3, 4]),
            # the shipped v5s config inherits out_channels/csp_repetition
            # from its _base_ (configs/yolov5/yolov5s_coco_mosaic.py:1 ->
            # configs/yolov4/yolov4s_coco_mosaic.py:4-8)
            neck=dict(type='YOLOV5Neck', in_channels=[128, 256, 512],
                      out_channels=[128, 256, 512], csp_repetition=1),
            bbox_head=dict(type='YOLOCSPHead', num_classes=nc,
                           in_channels=[128, 256, 512]),
            test_cfg=test_cfg)
        my_model_cfg = dict(ref_model_cfg)

    ref = _build_ref_detector(ref_model_cfg)

    s = 320
    x = RNG.rand(1, 3, s, s).astype(np.float32)
    sf = np.array([0.5, 0.5, 0.5, 0.5], np.float32)
    img_metas = [{'img_shape': (s, s, 3), 'ori_shape': (2 * s, 2 * s, 3),
                  'scale_factor': sf, 'pad_shape': (s, s, 3),
                  'flip': False}]
    ref_out = _ref_dets(ref, x, img_metas)

    from tpudet.models.builder import build_detector
    # pin the standard stem (bit-equal s2d variant is covered separately)
    my_model_cfg['backbone'] = {**my_model_cfg['backbone'],
                                'space_to_depth_stem': False}
    mine = build_detector(my_model_cfg)
    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    import torch as _torch  # noqa: F401
    variables = _convert(mine, (x_nhwc,), ref,
                         lambda m: m.forward_dummy(torch.from_numpy(x)))
    pred_maps = mine.apply(variables, x_nhwc)
    out = mine.get_bboxes(pred_maps,
                          scale_factors=jnp.asarray(sf)[None],
                          anchor_pre=0, class_pre=0)
    cb, cs = mine.get_bboxes(pred_maps,
                             scale_factors=jnp.asarray(sf)[None],
                             anchor_pre=0, class_pre=0, with_nms=False)
    candidates = (np.asarray(cb)[0], np.asarray(cs)[0])
    _assert_det_sets_equal(_my_dets(out), ref_out, candidates)


def test_retinanet_full_detector_parity():
    """Whole RetinaNet R-50-FPN: converted weights, shipped test_cfg
    (/root/reference/configs/_base_/models/retinanet_r50_fpn.py)."""
    import torch

    test_cfg = dict(nms_pre=1000, min_bbox_size=0, score_thr=0.05,
                    nms=dict(type='nms', iou_threshold=0.5),
                    max_per_img=100)
    ref_model_cfg = dict(
        type='RetinaNet',
        backbone=dict(type='ResNet', depth=50, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_cfg=dict(type='BN', requires_grad=True),
                      norm_eval=True, style='pytorch'),
        neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
                  out_channels=256, start_level=1,
                  add_extra_convs='on_input', num_outs=5),
        bbox_head=dict(
            type='RetinaHead', num_classes=80, in_channels=256,
            stacked_convs=4, feat_channels=256,
            anchor_generator=dict(
                type='AnchorGenerator', octave_base_scale=4,
                scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                strides=[8, 16, 32, 64, 128]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[0.0, 0.0, 0.0, 0.0],
                            target_stds=[1.0, 1.0, 1.0, 1.0]),
            loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                          alpha=0.25, loss_weight=1.0),
            loss_bbox=dict(type='L1Loss', loss_weight=1.0)),
        test_cfg=test_cfg)

    ref = _build_ref_detector(ref_model_cfg)

    s = 256
    x = RNG.rand(1, 3, s, s).astype(np.float32)
    sf = np.array([2.0, 2.0, 2.0, 2.0], np.float32)
    img_metas = [{'img_shape': (s, s, 3),
                  'ori_shape': (s // 2, s // 2, 3),
                  'scale_factor': sf, 'pad_shape': (s, s, 3),
                  'flip': False}]
    ref_out = _ref_dets(ref, x, img_metas)

    from tpudet.models.builder import build_detector
    my_model_cfg = dict(
        type='RetinaNet',
        backbone=dict(type='ResNet', depth=50, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
                  out_channels=256, start_level=1,
                  add_extra_convs='on_input', num_outs=5),
        bbox_head=dict(type='RetinaHead', num_classes=80, in_channels=256,
                       feat_channels=256, stacked_convs=4,
                       strides=[8, 16, 32, 64, 128], octave_base_scale=4,
                       scales_per_octave=3, ratios=[0.5, 1.0, 2.0]),
        test_cfg=test_cfg)
    mine = build_detector(my_model_cfg)
    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    variables = _convert(mine, (x_nhwc,), ref,
                         lambda m: m.forward_dummy(torch.from_numpy(x)))
    pred_maps = mine.apply(variables, x_nhwc)
    out = mine.get_bboxes(pred_maps,
                          scale_factors=jnp.asarray(sf)[None],
                          img_shape=(s, s))
    cb, cs = mine.get_bboxes(pred_maps,
                             scale_factors=jnp.asarray(sf)[None],
                             img_shape=(s, s), with_nms=False)
    candidates = (np.asarray(cb)[0], np.asarray(cs)[0])
    _assert_det_sets_equal(_my_dets(out), ref_out, candidates)
