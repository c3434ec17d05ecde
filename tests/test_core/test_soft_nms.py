import jax.numpy as jnp
import numpy as np

from tpudet.core.nms import multiclass_nms, soft_nms_padded


def test_soft_nms_decays_overlapping():
    boxes = np.array([[0., 0., 10., 10.], [1., 0., 11., 10.],
                      [50., 50., 60., 60.]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    idx, s, valid = soft_nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                                    0.3, 3, method='linear')
    idx = np.asarray(idx)
    s = np.asarray(s)
    assert idx[0] == 0 and np.isclose(s[0], 0.9)
    # box1 overlaps box0 with iou 9/11 ~ 0.818 -> decayed to 0.8*(1-0.818)
    # which drops below box2's 0.7 -> box2 picked second
    assert idx[1] == 2 and np.isclose(s[1], 0.7)
    assert idx[2] == 1
    np.testing.assert_allclose(s[2], 0.8 * (1 - 9 / 11), rtol=1e-4)


def test_soft_nms_min_score_cutoff():
    boxes = np.array([[0., 0., 10., 10.], [0.5, 0., 10.5, 10.]], np.float32)
    scores = np.array([0.9, 0.002], np.float32)
    _, s, valid = soft_nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                                  0.3, 2, min_score=1e-2)
    valid = np.asarray(valid)
    assert valid[0] and not valid[1]


def test_multiclass_soft_nms_path():
    boxes = jnp.asarray(np.array([[0., 0., 10., 10.], [1., 0., 11., 10.]],
                                 np.float32))
    scores = np.zeros((2, 2), np.float32)
    scores[0, 0] = 0.9
    scores[1, 0] = 0.8
    res = multiclass_nms(boxes, jnp.asarray(scores), 0.05, 0.3, 5,
                         nms_pre=4, nms_type='soft_nms')
    v = np.asarray(res.valid)
    s = np.asarray(res.scores)[v]
    assert v.sum() == 2  # both kept, second decayed not dropped
    assert s[0] > s[1]
    np.testing.assert_allclose(s[1], 0.8 * (1 - 9 / 11), rtol=1e-4)
