"""The fixed-point NMS must agree exactly with the sequential scan (and so
with the greedy reference) on random inputs."""
import jax.numpy as jnp
import numpy as np

from tpudet.core.nms import nms_padded, nms_padded_scan

from .test_nms import random_boxes


def test_fixedpoint_equals_scan():
    for seed in range(8):
        n = 96
        boxes = random_boxes(n, seed, spread=120.)
        scores = np.random.RandomState(seed + 50).rand(n).astype(np.float32)
        valid = np.random.RandomState(seed + 99).rand(n) > 0.2
        for thr in (0.3, 0.5, 0.7):
            i1, v1 = nms_padded_scan(jnp.asarray(boxes), jnp.asarray(scores),
                                     thr, 40, jnp.asarray(valid))
            i2, v2 = nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                                thr, 40, jnp.asarray(valid))
            a = np.asarray(i1)[np.asarray(v1)]
            b = np.asarray(i2)[np.asarray(v2)]
            np.testing.assert_array_equal(a, b)


def test_fixedpoint_suppression_chain():
    """A > B > C chain where A does not suppress C: greedy keeps A and C."""
    boxes = np.array([
        [0., 0., 10., 10.],   # A
        [4., 0., 14., 10.],   # B: iou(A,B) = 6/14 ~ 0.43
        [8., 0., 18., 10.],   # C: iou(B,C) ~ 0.43, iou(A,C) = 2/18 ~ 0.11
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    idx, valid = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.4, 3)
    kept = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(kept, [0, 2])
