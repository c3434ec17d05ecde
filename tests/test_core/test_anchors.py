import numpy as np

from tpudet.core.anchors import (AnchorGenerator, YOLOAnchorGenerator,
                                 YOLOV4AnchorGenerator)


def test_standard_anchor_generator_doc_values():
    # values from the reference docstring (anchor_generator.py:40-56)
    gen = AnchorGenerator(strides=[16], ratios=[1.], scales=[1.],
                          base_sizes=[9])
    anchors = gen.grid_anchors([(2, 2)])[0]
    expected = np.array([[-4.5, -4.5, 4.5, 4.5], [11.5, -4.5, 20.5, 4.5],
                         [-4.5, 11.5, 4.5, 20.5], [11.5, 11.5, 20.5, 20.5]])
    np.testing.assert_allclose(anchors, expected)

    gen = AnchorGenerator(strides=[16, 32], ratios=[1.], scales=[1.],
                          base_sizes=[9, 18])
    anchors = gen.grid_anchors([(2, 2), (1, 1)])
    np.testing.assert_allclose(anchors[1], np.array([[-9., -9., 9., 9.]]))


def test_standard_anchor_generator_octave_scales():
    gen = AnchorGenerator(
        strides=[8], ratios=[0.5, 1.0, 2.0], octave_base_scale=4,
        scales_per_octave=3)
    assert gen.num_base_anchors == [9]
    # ratio h/w: for ratio 1 scale 4, anchor is 32x32 centered at 0
    base = gen.base_anchors[0]
    sq = base[3]  # scale-major: ratio index 1 (=1.0), scale index 0 (=4)
    np.testing.assert_allclose(sq, [-16, -16, 16, 16])
    # area is ratio-invariant for a fixed scale (scale-major: idx = r*3+s)
    ws = base[:, 2] - base[:, 0]
    hs = base[:, 3] - base[:, 1]
    areas = (ws * hs).reshape(3, 3)  # (ratio, scale)
    np.testing.assert_allclose(areas[0], areas[1], rtol=1e-5)
    np.testing.assert_allclose(areas[0], areas[2], rtol=1e-5)


def test_yolo_anchor_generator_centers_and_layout():
    gen = YOLOV4AnchorGenerator(
        strides=[8], base_sizes=[[(12, 16), (19, 36), (40, 28)]])
    base = gen.base_anchors[0]
    # centers at stride/2 (anchor_generator.py:606)
    np.testing.assert_allclose((base[:, :2] + base[:, 2:]) / 2, 4.0)
    np.testing.assert_allclose(base[:, 2] - base[:, 0], [12, 19, 40])

    anchors = gen.grid_anchors([(2, 3)])[0]
    assert anchors.shape == (2 * 3 * 3, 4)
    # base-anchor axis fastest, then x, then y
    np.testing.assert_allclose(anchors[3] - anchors[0], [8, 0, 8, 0])
    np.testing.assert_allclose(anchors[9] - anchors[0], [0, 8, 0, 8])


def test_valid_flags():
    gen = AnchorGenerator(strides=[8], ratios=[1.], scales=[1.])
    flags = gen.valid_flags([(4, 4)], (20, 28))[0]
    v = flags.reshape(4, 4)
    assert v[:3, :].all() and not v[3, :].any()
