import jax.numpy as jnp
import numpy as np

from tpudet.core.assigners import NEGATIVE, atss_assign
from tpudet.core.bbox import TBLRBBoxCoder


def test_tblr_roundtrip():
    coder = TBLRBBoxCoder(normalizer=4.0)
    anchors = jnp.asarray(np.array([[0., 0., 16., 16.], [8., 8., 40., 24.]],
                                   np.float32))
    gts = jnp.asarray(np.array([[2., 1., 14., 18.], [10., 6., 44., 26.]],
                               np.float32))
    enc = coder.encode(anchors, gts)
    dec = coder.decode(anchors, enc)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(gts), atol=1e-4)


def test_atss_assign_basic():
    # one level, 4x4 grid of 8x8 anchors, stride 8
    xs, ys = np.meshgrid(np.arange(4) * 8 + 4, np.arange(4) * 8 + 4)
    centers = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
    anchors = np.concatenate([centers - 4, centers + 4], -1)
    gt = np.array([[6., 6., 20., 20.]], np.float32)  # covers a few cells
    out = np.asarray(atss_assign(
        jnp.asarray(anchors), [16], jnp.asarray(gt),
        jnp.asarray([True]), topk=4))
    pos = np.where(out == 0)[0]
    assert len(pos) > 0
    # positive anchors' centers must be inside the gt
    for a in pos:
        cx, cy = centers[a]
        assert 6 < cx < 20 and 6 < cy < 20
    # no positives for invalid gts
    out2 = np.asarray(atss_assign(
        jnp.asarray(anchors), [16], jnp.asarray(gt),
        jnp.asarray([False]), topk=4))
    assert (out2 == NEGATIVE).all()
