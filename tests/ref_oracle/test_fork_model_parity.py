"""Golden parity of the FORK model stack (DarknetCSP / YOLO-CSP necks /
YOLOCSPHead — the north-star YOLOv4/v5 models) against the LIVE
reference implementation with weights converted layer-by-layer in
execution order.

This is the strongest feasible stand-in for trained-checkpoint parity in
this environment: if the architectures were wired differently (channel
order, branch order, BN placement, SPP pooling, decode math), the
converted-weight outputs would diverge immediately.
"""
import numpy as np
import pytest

from . import refbridge

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

RNG = np.random.RandomState(7)


def _convert(flax_model, flax_init_args, torch_model, torch_forward):
    from tpudet.utils.weight_convert import (assign_torch_sequence,
                                             flax_layer_order,
                                             torch_module_sequence)
    order = flax_layer_order(flax_model, *flax_init_args)
    torch_layers = torch_module_sequence(torch_model, torch_forward)
    variables = flax_model.init(jax.random.PRNGKey(0), *flax_init_args)
    return assign_torch_sequence(variables, order, torch_layers)


def _seeded_ref(builder):
    import torch
    torch.manual_seed(0)
    model = builder()
    model.eval()
    # randomize BN stats so parity also covers running-stat handling
    torch.manual_seed(1)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.7, 1.3)
    return model


@pytest.mark.parametrize('scale', ['v4s5p', 'v5s5p'])
def test_darknet_csp_backbone_parity(scale):
    import torch
    backbones = refbridge.ref_import('mmdet.models.backbones')

    ref = _seeded_ref(lambda: backbones.DarknetCSP(
        scale=scale, out_indices=(3, 4, 5) if scale.startswith('v4')
        else (2, 3, 4)))

    x = RNG.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x))
    ref_outs = [refbridge.to_numpy(o) for o in ref_outs]

    from tpudet.models.backbones.darknet_csp import DarknetCSP
    out_indices = (3, 4, 5) if scale.startswith('v4') else (2, 3, 4)
    # pin the STANDARD stem against torch; the space-to-depth stem is
    # proven equivalent to it separately (tests/test_models/test_s2d_stem)
    # and its fp32 reassociation noise would otherwise eat this tolerance
    mine = DarknetCSP(scale=scale, out_indices=out_indices,
                      space_to_depth_stem=False)
    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    variables = _convert(mine, (x_nhwc,), ref,
                         lambda m: m(torch.from_numpy(x)))
    my_outs = mine.apply(variables, x_nhwc)
    assert len(my_outs) == len(ref_outs)
    for mo, ro in zip(my_outs, ref_outs):
        ro_nhwc = np.transpose(ro, (0, 2, 3, 1))
        assert mo.shape == ro_nhwc.shape
        np.testing.assert_allclose(np.asarray(mo), ro_nhwc, atol=1e-3,
                                   rtol=2e-2)


@pytest.mark.parametrize('version', ['v4', 'v5'])
def test_yolo_csp_neck_parity(version):
    import torch
    necks = refbridge.ref_import('mmdet.models.necks')

    in_ch = [64, 128, 256]
    out_ch = [64, 128, 256]
    if version == 'v4':
        builder = lambda: necks.YOLOV4Neck(  # noqa: E731
            in_channels=in_ch, out_channels=out_ch)
        from tpudet.models.necks.yolo_neck_csp import YOLOV4Neck as Mine
    else:
        builder = lambda: necks.YOLOV5Neck(  # noqa: E731
            in_channels=in_ch, out_channels=out_ch)
        from tpudet.models.necks.yolo_neck_csp import YOLOV5Neck as Mine

    ref = _seeded_ref(builder)
    feats = [RNG.rand(1, c, 32 // (2**i), 32 // (2**i)).astype(np.float32)
             for i, c in enumerate(in_ch)]
    tfeats = [torch.from_numpy(f) for f in feats]
    with torch.no_grad():
        ref_outs = ref(tfeats)
    ref_outs = [refbridge.to_numpy(o) for o in ref_outs]

    mine = Mine(in_channels=tuple(in_ch), out_channels=tuple(out_ch))
    nfeats = tuple(np.transpose(f, (0, 2, 3, 1)) for f in feats)
    variables = _convert(mine, (nfeats,), ref, lambda m: m(tfeats))
    my_outs = mine.apply(variables, nfeats)
    assert len(my_outs) == len(ref_outs)
    for mo, ro in zip(my_outs, ref_outs):
        ro_nhwc = np.transpose(ro, (0, 2, 3, 1))
        assert mo.shape == ro_nhwc.shape
        np.testing.assert_allclose(np.asarray(mo), ro_nhwc, atol=1e-3,
                                   rtol=2e-2)


def test_yolocsp_head_get_bboxes_parity():
    """YOLOCSPHead conv + decode + (raw) score path vs reference,
    with converted 1x1 conv weights and the same random features."""
    import torch
    mmcv = refbridge.ref_import('mmcv')
    heads = refbridge.ref_import('mmdet.models.dense_heads')

    test_cfg = mmcv.Config(dict(
        min_bbox_size=0, score_thr=0.05, conf_thr=0.005,
        nms=dict(type='nms', iou_threshold=0.45), max_per_img=100))
    torch.manual_seed(0)
    ref = heads.YOLOCSPHead(
        num_classes=4, in_channels=[32, 64, 128],
        test_cfg=test_cfg)
    ref.eval()

    feats = [RNG.rand(1, c, 32 // (2**i), 32 // (2**i)).astype(np.float32)
             for i, c in enumerate([32, 64, 128])]
    tfeats = [torch.from_numpy(f) for f in feats]
    s = 256
    img_metas = [{'img_shape': (s, s, 3), 'scale_factor': 1.0,
                  'pad_shape': (s, s, 3)}]
    with torch.no_grad():
        pred_maps = ref(tfeats)
        ref_dets, ref_labels = ref.get_bboxes(
            *pred_maps, img_metas=img_metas)[0]
    ref_dets = refbridge.to_numpy(ref_dets)
    ref_labels = refbridge.to_numpy(ref_labels)

    from tpudet.models.dense_heads.yolocsp_head import YOLOCSPHead
    mine = YOLOCSPHead(num_classes=4, in_channels=(32, 64, 128))
    nfeats = tuple(np.transpose(f, (0, 2, 3, 1)) for f in feats)
    variables = _convert(mine, (nfeats,), ref, lambda m: m(tfeats))
    my_preds = mine.apply(variables, nfeats)
    out = mine.get_bboxes(my_preds, score_thr=0.05, iou_thr=0.45,
                          max_per_img=100, nms_pre=0, anchor_pre=0)
    my_boxes = np.asarray(out.bboxes)[0]
    my_scores = np.asarray(out.scores)[0]
    my_labels = np.asarray(out.labels)[0]
    valid = np.asarray(out.valid)[0].astype(bool)

    n_ref = ref_dets.shape[0]
    assert valid.sum() == n_ref, (valid.sum(), n_ref)
    np.testing.assert_allclose(my_boxes[:n_ref], ref_dets[:, :4], atol=5e-3)
    np.testing.assert_allclose(my_scores[:n_ref], ref_dets[:, 4], atol=1e-4)
    np.testing.assert_array_equal(my_labels[:n_ref], ref_labels)


def test_yolov3_neck_parity_on_fixture():
    """YOLOV3Neck forward on the reference's yolov3_neck.pkl fixture
    inputs with converted weights (test_neck.py yolo_neck_config)."""
    import torch
    necks = refbridge.ref_import('mmdet.models.necks')
    ref = _seeded_ref(lambda: necks.YOLOV3Neck(
        num_scales=3, in_channels=[16, 8, 4], out_channels=[8, 4, 2]))

    feats = refbridge.load_fixture('yolov3_neck.pkl')
    # fixture order: (1,4,64,64), (1,8,32,32), (1,16,16,16) — the neck
    # takes deepest-last tuple like the backbone emits
    tfeats = tuple(feats)
    with torch.no_grad():
        ref_outs = ref(tfeats)
    ref_outs = [refbridge.to_numpy(o) for o in ref_outs]

    from tpudet.models.necks.yolo_neck import YOLOV3Neck
    mine = YOLOV3Neck(num_scales=3, in_channels=(16, 8, 4),
                      out_channels=(8, 4, 2))
    nfeats = tuple(np.transpose(refbridge.to_numpy(f), (0, 2, 3, 1))
                   for f in feats)
    variables = _convert(mine, (nfeats,), ref, lambda m: m(tfeats))
    my_outs = mine.apply(variables, nfeats)
    assert len(my_outs) == len(ref_outs)
    for mo, ro in zip(my_outs, ref_outs):
        ro_nhwc = np.transpose(ro, (0, 2, 3, 1))
        assert mo.shape == ro_nhwc.shape
        np.testing.assert_allclose(np.asarray(mo), ro_nhwc, atol=1e-3,
                                   rtol=2e-2)


def test_fpn_parity():
    """FPN (add_extra_convs='on_input' RetinaNet flavor) with converted
    weights (test_neck.py fpn_neck_config shapes)."""
    import torch
    necks = refbridge.ref_import('mmdet.models.necks')
    in_channels = [8, 16, 32, 64]
    ref = _seeded_ref(lambda: necks.FPN(
        in_channels=in_channels, out_channels=8, add_extra_convs=True,
        num_outs=5))

    s = 64
    feats = [RNG.rand(1, c, s // 2**i, s // 2**i).astype(np.float32)
             for i, c in enumerate(in_channels)]
    tfeats = [torch.from_numpy(f) for f in feats]
    with torch.no_grad():
        ref_outs = ref(tfeats)
    ref_outs = [refbridge.to_numpy(o) for o in ref_outs]

    from tpudet.models.necks.fpn import FPN
    mine = FPN(in_channels=tuple(in_channels), out_channels=8, num_outs=5,
               add_extra_convs='on_input')
    nfeats = tuple(np.transpose(f, (0, 2, 3, 1)) for f in feats)
    variables = _convert(mine, (nfeats,), ref, lambda m: m(tfeats))
    my_outs = mine.apply(variables, nfeats)
    assert len(my_outs) == len(ref_outs)
    for mo, ro in zip(my_outs, ref_outs):
        ro_nhwc = np.transpose(ro, (0, 2, 3, 1))
        assert mo.shape == ro_nhwc.shape
        np.testing.assert_allclose(np.asarray(mo), ro_nhwc, atol=1e-3,
                                   rtol=2e-2)
