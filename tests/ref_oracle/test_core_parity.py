"""Golden parity of core primitives vs the LIVE reference code:
bbox coders, IoU/GIoU overlaps, loss functions, and the fork's
``responsible_indices`` assignment (the YOLOv4/v5 target machinery).

Random inputs are seeded; the reference side runs in torch via the
oracle bridge, the tpudet side in jax — outputs must agree to float32
tolerance.
"""
import numpy as np
import pytest

from . import refbridge

jnp = pytest.importorskip('jax.numpy')

RNG = np.random.RandomState(20260817)


def _rand_boxes(n, size=256.0, rng=RNG):
    xy = rng.uniform(0, size * 0.8, (n, 2))
    wh = rng.uniform(1, size * 0.3, (n, 2))
    return np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)


# ---------------------------------------------------------------- coders
def test_delta_coder_parity():
    import torch
    coder_mod = refbridge.ref_import('mmdet.core.bbox.coder')
    ref = coder_mod.DeltaXYWHBBoxCoder(target_means=(.1, .2, .0, .0),
                                       target_stds=(0.1, 0.1, 0.2, 0.2))
    from tpudet.core.bbox import DeltaXYWHBBoxCoder
    mine = DeltaXYWHBBoxCoder(target_means=(.1, .2, .0, .0),
                              target_stds=(0.1, 0.1, 0.2, 0.2))
    anchors = _rand_boxes(200)
    gts = _rand_boxes(200)
    # encode
    ref_enc = ref.encode(torch.from_numpy(anchors), torch.from_numpy(gts))
    my_enc = np.asarray(mine.encode(anchors, gts))
    np.testing.assert_allclose(my_enc, ref_enc.numpy(), atol=1e-4, rtol=1e-4)
    # decode incl. wh clamp + max_shape clip; big deltas exercise clamps
    deltas = RNG.randn(200, 4).astype(np.float32) * 20
    ref_dec = ref.decode(torch.from_numpy(anchors),
                         torch.from_numpy(deltas), max_shape=(256, 256))
    my_dec = np.asarray(mine.decode(anchors, deltas, max_shape=(256, 256)))
    np.testing.assert_allclose(my_dec, ref_dec.numpy(), atol=1e-2, rtol=1e-4)


def test_tblr_coder_parity():
    import torch
    coder_mod = refbridge.ref_import('mmdet.core.bbox.coder')
    ref = coder_mod.TBLRBBoxCoder(normalizer=4.0)
    from tpudet.core.bbox import TBLRBBoxCoder
    mine = TBLRBBoxCoder(normalizer=4.0)
    anchors = _rand_boxes(150)
    gts = _rand_boxes(150)
    ref_enc = ref.encode(torch.from_numpy(anchors), torch.from_numpy(gts))
    my_enc = np.asarray(mine.encode(anchors, gts))
    np.testing.assert_allclose(my_enc, ref_enc.numpy(), atol=1e-4, rtol=1e-4)
    preds = np.abs(RNG.randn(150, 4)).astype(np.float32)
    ref_dec = ref.decode(torch.from_numpy(anchors), torch.from_numpy(preds),
                         max_shape=(256, 256))
    my_dec = np.asarray(mine.decode(anchors, preds, max_shape=(256, 256)))
    np.testing.assert_allclose(my_dec, ref_dec.numpy(), atol=1e-3, rtol=1e-4)


def test_yolo_coder_parity():
    import torch
    coder_mod = refbridge.ref_import('mmdet.core.bbox.coder')
    ref = coder_mod.YOLOBBoxCoder()
    from tpudet.core.bbox import YOLOBBoxCoder
    anchors = _rand_boxes(100)
    stride = 16
    # decode: xy in (0,1) sigmoid space, wh log-scale
    preds = np.concatenate([
        RNG.uniform(0.01, 0.99, (100, 2)), RNG.randn(100, 2) * 0.5
    ], axis=-1).astype(np.float32)
    ref_dec = ref.decode(torch.from_numpy(anchors), torch.from_numpy(preds),
                         stride)
    my_dec = np.asarray(YOLOBBoxCoder.decode(anchors, preds, float(stride)))
    np.testing.assert_allclose(my_dec, ref_dec.numpy(), atol=1e-3, rtol=1e-4)
    # encode
    gts = _rand_boxes(100)
    ref_enc = ref.encode(torch.from_numpy(anchors), torch.from_numpy(gts),
                         stride)
    my_enc = np.asarray(YOLOBBoxCoder().encode(anchors, gts, float(stride)))
    np.testing.assert_allclose(my_enc, ref_enc.numpy(), atol=1e-4, rtol=1e-4)


def test_yolov4_coder_parity():
    import torch
    refbridge.setup()
    coder_mod = refbridge.ref_import(
        'mmdet.core.bbox.coder.yolov4_bbox_coder')
    ref = coder_mod.YOLOV4BBoxCoder()
    from tpudet.core.bbox import YOLOV4BBoxCoder
    anchors = _rand_boxes(100)
    stride = 8
    preds = (RNG.uniform(-1, 2, (100, 4))).astype(np.float32)
    ref_dec = ref.decode(torch.from_numpy(anchors), torch.from_numpy(preds),
                         stride)
    my_dec = np.asarray(YOLOV4BBoxCoder.decode(anchors, preds, float(stride)))
    np.testing.assert_allclose(my_dec, ref_dec.numpy(), atol=1e-3, rtol=1e-4)


# ---------------------------------------------------------------- overlaps
@pytest.mark.parametrize('mode', ['iou', 'iof', 'giou'])
def test_bbox_overlaps_parity(mode):
    import torch
    iou_mod = refbridge.ref_import('mmdet.core.bbox.iou_calculators')
    from tpudet.core.bbox import bbox_overlaps
    a = _rand_boxes(64)
    b = _rand_boxes(48)
    ref = iou_mod.bbox_overlaps(torch.from_numpy(a), torch.from_numpy(b),
                                mode=mode)
    mine = np.asarray(bbox_overlaps(a, b, mode=mode))
    np.testing.assert_allclose(mine, ref.numpy(), atol=1e-5, rtol=1e-4)


def test_bbox_overlaps_aligned_parity():
    import torch
    iou_mod = refbridge.ref_import('mmdet.core.bbox.iou_calculators')
    from tpudet.core.bbox import bbox_overlaps_aligned
    a = _rand_boxes(64)
    b = _rand_boxes(64)
    for mode in ('iou', 'giou'):
        ref = iou_mod.bbox_overlaps(torch.from_numpy(a), torch.from_numpy(b),
                                    mode=mode, is_aligned=True)
        mine = np.asarray(bbox_overlaps_aligned(a, b, mode=mode))
        np.testing.assert_allclose(mine, ref.numpy(), atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------- losses
def test_giou_loss_parity():
    import torch
    losses = refbridge.ref_import('mmdet.models.losses')
    from tpudet.models import losses as L
    pred = _rand_boxes(80)
    target = _rand_boxes(80)
    ref = losses.GIoULoss(reduction='none')(torch.from_numpy(pred),
                                            torch.from_numpy(target))
    mine = np.asarray(L.giou_loss(pred, target, reduction='none'))
    np.testing.assert_allclose(mine, ref.numpy(), atol=1e-5, rtol=1e-4)


def test_focal_loss_parity():
    import torch
    losses = refbridge.ref_import('mmdet.models.losses')
    from tpudet.models import losses as L
    n, c = 128, 7
    pred = RNG.randn(n, c).astype(np.float32)
    labels = RNG.randint(0, c + 1, n)  # c == background
    ref_loss = losses.FocalLoss(use_sigmoid=True, gamma=2.0, alpha=0.25)
    ref = ref_loss(torch.from_numpy(pred), torch.from_numpy(labels),
                   avg_factor=50.0)
    onehot = np.zeros((n, c), np.float32)
    fg = labels < c
    onehot[np.arange(n)[fg], labels[fg]] = 1.0
    mine = np.asarray(
        L.sigmoid_focal_loss(pred, onehot, gamma=2.0, alpha=0.25,
                             avg_factor=50.0))
    np.testing.assert_allclose(mine, float(ref), atol=1e-5, rtol=1e-4)


def test_smooth_l1_and_balanced_l1_parity():
    import torch
    losses = refbridge.ref_import('mmdet.models.losses')
    from tpudet.models import losses as L
    pred = RNG.randn(100, 4).astype(np.float32) * 3
    target = RNG.randn(100, 4).astype(np.float32)
    ref = losses.SmoothL1Loss(beta=1.0, reduction='none')(
        torch.from_numpy(pred), torch.from_numpy(target))
    mine = np.asarray(L.smooth_l1_loss(pred, target, beta=1.0,
                                       reduction='none'))
    np.testing.assert_allclose(mine, ref.numpy(), atol=1e-6, rtol=1e-5)

    ref_b = losses.BalancedL1Loss(reduction='none')(
        torch.from_numpy(pred), torch.from_numpy(target))
    mine_b = np.asarray(L.balanced_l1_loss(pred, target, reduction='none'))
    np.testing.assert_allclose(mine_b, ref_b.numpy(), atol=1e-5, rtol=1e-4)


def test_varifocal_loss_parity():
    import torch
    losses = refbridge.ref_import('mmdet.models.losses')
    from tpudet.models import losses as L
    n, c = 90, 5
    pred = RNG.randn(n, c).astype(np.float32)
    target = np.zeros((n, c), np.float32)
    pos = RNG.rand(n, c) < 0.1
    target[pos] = RNG.uniform(0.1, 1.0, pos.sum())
    ref = losses.VarifocalLoss(reduction='none')(
        torch.from_numpy(pred), torch.from_numpy(target))
    mine = np.asarray(L.varifocal_loss(pred, target, reduction='none'))
    np.testing.assert_allclose(mine, ref.numpy(), atol=1e-5, rtol=1e-4)


def test_ghm_c_parity():
    import torch
    losses = refbridge.ref_import('mmdet.models.losses')
    from tpudet.models import losses as L
    n, c = 200, 6
    pred = RNG.randn(n, c).astype(np.float32)
    target = (RNG.rand(n, c) < 0.05).astype(np.float32)
    label_weight = (RNG.rand(n, c) < 0.9).astype(np.float32)
    ref_loss = losses.GHMC(bins=10, momentum=0.0)
    ref = ref_loss(torch.from_numpy(pred), torch.from_numpy(target),
                   torch.from_numpy(label_weight))
    mine = np.asarray(L.ghm_c_loss(pred, target, label_weight=label_weight,
                                   bins=10))
    np.testing.assert_allclose(mine, float(ref), atol=1e-5, rtol=1e-4)


def test_ghm_r_parity():
    import torch
    losses = refbridge.ref_import('mmdet.models.losses')
    from tpudet.models import losses as L
    n = 200
    pred = RNG.randn(n, 4).astype(np.float32)
    target = (RNG.randn(n, 4) * 0.5).astype(np.float32)
    label_weight = (RNG.rand(n, 4) < 0.7).astype(np.float32)
    ref_loss = losses.GHMR(mu=0.02, bins=10, momentum=0.0, loss_weight=10.0)
    ref = ref_loss(torch.from_numpy(pred), torch.from_numpy(target),
                   torch.from_numpy(label_weight))
    mine = np.asarray(L.ghm_r_loss(pred, target, label_weight=label_weight,
                                   mu=0.02, bins=10, loss_weight=10.0))
    np.testing.assert_allclose(mine, float(ref), atol=1e-5, rtol=1e-4)


def test_gaussian_focal_parity():
    import torch
    losses = refbridge.ref_import('mmdet.models.losses')
    from tpudet.models import losses as L
    pred = RNG.uniform(0.01, 0.99, (60, 60)).astype(np.float32)
    target = np.zeros((60, 60), np.float32)
    target[10, 10] = 1.0
    target[30:40, 30:40] = RNG.uniform(0, 0.99, (10, 10))
    ref = losses.GaussianFocalLoss(reduction='none')(
        torch.from_numpy(pred), torch.from_numpy(target))
    mine = np.asarray(L.gaussian_focal_loss(pred, target, reduction='none'))
    np.testing.assert_allclose(mine, ref.numpy(), atol=1e-5, rtol=1e-4)


# ------------------------------------------------- responsible_indices
@pytest.mark.parametrize('neighbor', [0, 2, 3])
def test_responsible_indices_parity(neighbor):
    """The fork's shape-match + neighbor-cell assignment: reference
    variable-length index triples vs tpudet's dense masks
    (yolov4_anchor_generator.py:12-134 vs core/targets.py)."""
    import torch
    gen_mod = refbridge.ref_import('mmdet.core.anchor')
    base_sizes = [[(12, 16), (19, 36), (40, 28)],
                  [(36, 75), (76, 55), (72, 146)],
                  [(142, 110), (192, 243), (459, 401)]]
    strides = [8, 16, 32]
    ref_gen = gen_mod.YOLOV4AnchorGenerator(strides=strides,
                                            base_sizes=base_sizes)
    featmap_sizes = [(80, 80), (40, 40), (20, 20)]

    g = 14
    gt0 = _rand_boxes(g, size=640.0)
    gt1 = _rand_boxes(g - 5, size=640.0)
    ref_out = ref_gen.responsible_indices(
        [torch.Size(f) for f in featmap_sizes],
        [torch.from_numpy(gt0), torch.from_numpy(gt1)],
        neighbor=neighbor, shape_match_thres=4.0, device='cpu')

    from tpudet.core.targets import multilevel_responsible_matches
    pad = np.zeros((2, g, 4), np.float32)
    pad[0, :g] = gt0
    pad[1, :g - 5] = gt1
    valid = np.zeros((2, g), bool)
    valid[0, :] = True
    valid[1, :g - 5] = True
    whs = [np.array([[w, h] for (w, h) in lvl], np.float32)
           for lvl in base_sizes]
    matches = multilevel_responsible_matches(
        jnp.asarray(pad), jnp.asarray(valid), featmap_sizes,
        [float(s) for s in strides], whs, neighbor=neighbor)

    for lvl in range(3):
        img_ids, anchor_ids, gt_ids = [refbridge.to_numpy(t)
                                       for t in ref_out[lvl]]
        # reference gt ids index the concatenated gt list
        ref_set = set()
        for i, a, t in zip(img_ids, anchor_ids, gt_ids):
            local_gt = t - (g if i == 1 else 0)
            ref_set.add((int(i), int(a), int(local_gt)))

        m = matches[lvl]
        idx = np.asarray(m.anchor_idx)  # (B, G, A, O)
        msk = np.asarray(m.mask)
        my_set = set()
        B, G, A, O = msk.shape
        for b in range(B):
            for gi in range(G):
                for a in range(A):
                    for o in range(O):
                        if msk[b, gi, a, o]:
                            my_set.add((b, int(idx[b, gi, a, o]), gi))
        assert my_set == ref_set, (
            f'level {lvl}: {len(my_set ^ ref_set)} differing triples')


def test_class_sorted_and_dense_nms_match_reference_multiclass_nms():
    """The shipped per-class-budget NMS and the exact dense per-class NMS
    must reproduce the reference multiclass_nms detection set (reference
    mmdet/core/post_processing/bbox_nms.py:7)."""
    import torch
    post = refbridge.ref_import('mmdet.core.post_processing')
    import jax.numpy as jnp

    from tpudet.core.nms import batched_class_sorted_nms, \
        batched_dense_class_nms

    n, c = 400, 6
    xy = RNG.rand(n, 2).astype(np.float32) * 100
    wh = RNG.rand(n, 2).astype(np.float32) * 30 + 4
    boxes = np.concatenate([xy, xy + wh], -1)
    scores = (RNG.rand(n, c + 1).astype(np.float32)) ** 2  # + bg column

    ref_dets, ref_labels = post.multiclass_nms(
        torch.from_numpy(boxes), torch.from_numpy(scores),
        score_thr=0.3, nms_cfg=dict(type='nms', iou_threshold=0.5),
        max_num=100)
    ref_dets = refbridge.to_numpy(ref_dets)
    ref_labels = refbridge.to_numpy(ref_labels)
    n_ref = len(ref_dets)

    for fn, kw in ((batched_class_sorted_nms, dict(class_pre=400)),
                   (batched_dense_class_nms, dict())):
        out = fn(jnp.asarray(boxes)[None], jnp.asarray(scores[:, :c])[None],
                 0.3, 0.5, 100, **kw)
        valid = np.asarray(out.valid)[0].astype(bool)
        assert valid.sum() == n_ref, fn.__name__
        np.testing.assert_allclose(np.asarray(out.bboxes)[0][:n_ref],
                                   ref_dets[:, :4], atol=1e-3,
                                   err_msg=fn.__name__)
        np.testing.assert_allclose(np.asarray(out.scores)[0][:n_ref],
                                   ref_dets[:, 4], atol=1e-5,
                                   err_msg=fn.__name__)
        np.testing.assert_array_equal(np.asarray(out.labels)[0][:n_ref],
                                      ref_labels, err_msg=fn.__name__)
