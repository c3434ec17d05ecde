"""Golden parity of target assigners vs the LIVE reference code:
MaxIoUAssigner, ATSSAssigner, GridAssigner (YOLOv3).  Assignment drives
every training loss, so these pin the training-correctness-critical
semantics (tie-breaks, low-quality matches, thresholds) to the
reference's actual behavior.
"""
import numpy as np
import pytest

from . import refbridge

jnp = pytest.importorskip('jax.numpy')

RNG = np.random.RandomState(31)


def _boxes(n, size=256.0, rng=RNG):
    xy = rng.uniform(0, size * 0.75, (n, 2))
    wh = rng.uniform(6, size * 0.3, (n, 2))
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


def _ref_to_codes(assign_result):
    """mmdet AssignResult.gt_inds: 0 = negative, -1 = ignore, >0 = gt+1.
    Convert to tpudet codes: -1 negative, -2 ignore, >=0 gt."""
    gi = refbridge.to_numpy(assign_result.gt_inds).astype(np.int64)
    out = np.where(gi > 0, gi - 1, np.where(gi == 0, -1, -2))
    return out


@pytest.mark.parametrize('match_low_quality', [True, False])
def test_max_iou_assigner_parity(match_low_quality):
    import torch
    assigners = refbridge.ref_import('mmdet.core.bbox.assigners')
    from tpudet.core.assigners import max_iou_assign

    ref = assigners.MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4,
                                   min_pos_iou=0.2,
                                   match_low_quality=match_low_quality)
    for seed in range(4):
        rng = np.random.RandomState(seed)
        anchors = _boxes(300, rng=rng)
        gts = _boxes(7, rng=rng)
        res = ref.assign(torch.from_numpy(anchors), torch.from_numpy(gts))
        ref_codes = _ref_to_codes(res)
        mine = np.asarray(max_iou_assign(
            jnp.asarray(anchors), jnp.asarray(gts),
            jnp.ones(7, bool), 0.5, 0.4, 0.2, match_low_quality))
        np.testing.assert_array_equal(mine, ref_codes)


def test_max_iou_assigner_parity_tuple_neg_thr_ignore():
    """neg_iou_thr as an interval + between-thresholds ignore band."""
    import torch
    assigners = refbridge.ref_import('mmdet.core.bbox.assigners')
    from tpudet.core.assigners import max_iou_assign

    # scalar thr but pos > neg creates an ignore band (0.3, 0.6)
    ref = assigners.MaxIoUAssigner(pos_iou_thr=0.6, neg_iou_thr=0.3,
                                   min_pos_iou=0.0,
                                   match_low_quality=False)
    rng = np.random.RandomState(11)
    anchors = _boxes(400, rng=rng)
    gts = _boxes(5, rng=rng)
    res = ref.assign(torch.from_numpy(anchors), torch.from_numpy(gts))
    ref_codes = _ref_to_codes(res)
    mine = np.asarray(max_iou_assign(
        jnp.asarray(anchors), jnp.asarray(gts), jnp.ones(5, bool),
        0.6, 0.3, 0.0, False))
    np.testing.assert_array_equal(mine, ref_codes)


def test_atss_assigner_parity():
    import torch
    assigners = refbridge.ref_import('mmdet.core.bbox.assigners')
    from tpudet.core.anchors import AnchorGenerator
    from tpudet.core.assigners import atss_assign

    gen = AnchorGenerator(strides=[8, 16, 32], ratios=[1.0],
                          octave_base_scale=8, scales_per_octave=1)
    featmaps = [(16, 16), (8, 8), (4, 4)]
    per_level = gen.grid_anchors(featmaps)
    anchors = np.concatenate(per_level).astype(np.float32)
    num_level = [len(a) for a in per_level]

    ref = assigners.ATSSAssigner(topk=9)
    for seed in range(3):
        rng = np.random.RandomState(seed)
        gts = _boxes(6, size=128.0, rng=rng)
        res = ref.assign(torch.from_numpy(anchors), num_level,
                         torch.from_numpy(gts), None)
        ref_codes = _ref_to_codes(res)
        mine = np.asarray(atss_assign(
            jnp.asarray(anchors), num_level, jnp.asarray(gts),
            jnp.ones(6, bool), topk=9))
        np.testing.assert_array_equal(mine, ref_codes)


def test_grid_assigner_parity():
    import torch
    assigners = refbridge.ref_import('mmdet.core.bbox.assigners')
    from tpudet.core.anchors import YOLOAnchorGenerator
    from tpudet.core.assigners import grid_assign

    base_sizes = [[(20, 30), (40, 25), (60, 60)]]
    gen = YOLOAnchorGenerator(strides=[16], base_sizes=base_sizes)
    featmap = (10, 10)
    anchors = gen.grid_anchors([featmap])[0].astype(np.float32)

    ref = assigners.GridAssigner(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                 min_pos_iou=0.0)
    for seed in range(3):
        rng = np.random.RandomState(seed)
        gts = _boxes(4, size=160.0, rng=rng)
        flags_np = np.concatenate(
            gen.responsible_flags([featmap], gts))
        res = ref.assign(torch.from_numpy(anchors),
                         torch.from_numpy(flags_np),
                         torch.from_numpy(gts))
        ref_codes = _ref_to_codes(res)
        mine = np.asarray(grid_assign(
            jnp.asarray(anchors), jnp.asarray(flags_np),
            jnp.asarray(gts), jnp.ones(4, bool), 0.5, 0.5, 0.0))
        np.testing.assert_array_equal(mine, ref_codes)
