import jax.numpy as jnp
import numpy as np

from tpudet.core.bbox import (DeltaXYWHBBoxCoder, YOLOV4BBoxCoder,
                              bbox_overlaps, bbox_overlaps_aligned)


def test_yolov4_coder_decode():
    # anchor 8x8 centered at (4, 4), stride 8
    anchors = jnp.array([[0., 0., 8., 8.]])
    # pred: xy offset 0.5 strides, wh scale 2
    pred = jnp.array([[0.5, -0.25, 2.0, 0.5]])
    out = YOLOV4BBoxCoder.decode(anchors, pred, 8.0)
    # cx = 4 + 0.5*8 = 8; cy = 4 - 2 = 2; w = 16, h = 4
    np.testing.assert_allclose(out, [[0., 0., 16., 4.]], atol=1e-5)


def test_delta_coder_roundtrip():
    coder = DeltaXYWHBBoxCoder(target_stds=(0.1, 0.1, 0.2, 0.2))
    anchors = jnp.array([[0., 0., 10., 10.], [5., 5., 20., 30.]])
    gts = jnp.array([[1., 2., 11., 13.], [4., 4., 16., 28.]])
    deltas = coder.encode(anchors, gts)
    rec = coder.decode(anchors, deltas)
    np.testing.assert_allclose(rec, gts, atol=1e-3)


def test_iou_known_values():
    a = jnp.array([[0., 0., 10., 10.]])
    b = jnp.array([[5., 5., 15., 15.]])
    iou = bbox_overlaps_aligned(a, b)
    np.testing.assert_allclose(iou, [25. / 175.], rtol=1e-5)

    # disjoint boxes: iou 0, giou negative
    c = jnp.array([[20., 20., 30., 30.]])
    giou = bbox_overlaps_aligned(a, c, mode='giou')
    # enclose 30x30=900, union 200 -> giou = 0 - 700/900
    np.testing.assert_allclose(giou, [-700. / 900.], rtol=1e-5)


def test_pairwise_matches_aligned():
    rng = np.random.RandomState(0)
    xy = rng.rand(6, 2) * 50
    wh = rng.rand(6, 2) * 30 + 1
    boxes1 = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    xy2 = rng.rand(4, 2) * 50
    wh2 = rng.rand(4, 2) * 30 + 1
    boxes2 = np.concatenate([xy2, xy2 + wh2], -1).astype(np.float32)
    pair = bbox_overlaps(jnp.asarray(boxes1), jnp.asarray(boxes2))
    for i in range(6):
        for j in range(4):
            single = bbox_overlaps_aligned(
                jnp.asarray(boxes1[i]), jnp.asarray(boxes2[j]))
            np.testing.assert_allclose(pair[i, j], single, rtol=1e-5)
