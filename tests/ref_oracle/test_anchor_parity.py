"""Anchor/point grid parity vs the LIVE reference generators across the
config variations the model zoo actually uses (reference
mmdet/core/anchor/anchor_generator.py, point_generator.py)."""
import numpy as np
import pytest

from . import refbridge

pytest.importorskip('jax')

CASES = [
    # retinanet: octave scales, 3 ratios
    dict(strides=[8, 16, 32, 64, 128], ratios=[0.5, 1.0, 2.0],
         octave_base_scale=4, scales_per_octave=3),
    # atss/gfl: single scale per cell
    dict(strides=[8, 16, 32, 64, 128], ratios=[1.0],
         octave_base_scale=8, scales_per_octave=1),
    # rpn/faster-rcnn: explicit scales
    dict(strides=[4, 8, 16, 32, 64], ratios=[0.5, 1.0, 2.0], scales=[8]),
    # ssd-style explicit base sizes + centered anchors
    dict(strides=[8, 16], ratios=[1.0, 0.5, 2.0], scales=[1, 2],
         base_sizes=[32, 64], center_offset=0.5),
    # yolof: wide scale range on one level
    dict(strides=[32], ratios=[1.0], scales=[1, 2, 4, 8, 16]),
]


@pytest.mark.parametrize('case', range(len(CASES)))
def test_grid_anchors_match_reference(case):
    cfg = dict(CASES[case])
    core = refbridge.ref_import('mmdet.core')
    ref_gen = core.build_anchor_generator(
        dict(type='AnchorGenerator', **cfg))
    sizes = [(max(64 // st, 1), max(80 // st, 1)) for st in cfg['strides']]
    ref = [refbridge.to_numpy(a)
           for a in ref_gen.grid_anchors(sizes, device='cpu')]

    from tpudet.core.anchors import AnchorGenerator
    mine = AnchorGenerator(**cfg).grid_anchors(sizes)
    assert len(mine) == len(ref)
    for m, r in zip(mine, ref):
        np.testing.assert_allclose(np.asarray(m), r, atol=1e-4)
