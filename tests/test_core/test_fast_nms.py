import jax.numpy as jnp
import numpy as np

from tpudet.core.nms import fast_nms


def test_fast_nms_keeps_distinct_and_suppresses_overlap():
    boxes = np.array([[0., 0., 10., 10.], [1., 0., 11., 10.],
                      [50., 50., 60., 60.]], np.float32)
    scores = np.zeros((3, 2), np.float32)
    scores[0, 0] = 0.9
    scores[1, 0] = 0.8  # overlaps box0, same class -> suppressed
    scores[2, 0] = 0.7
    res = fast_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.05, 0.5,
                   top_k=3, max_per_img=5)
    v = np.asarray(res.valid)
    kept = np.sort(np.asarray(res.scores)[v])
    np.testing.assert_allclose(kept, [0.7, 0.9], atol=1e-6)


def test_fast_nms_class_aware():
    boxes = np.array([[0., 0., 10., 10.], [0., 0., 10., 10.]], np.float32)
    scores = np.zeros((2, 3), np.float32)
    scores[0, 0] = 0.9
    scores[1, 2] = 0.8  # same box, different class: both kept
    res = fast_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.05, 0.5,
                   top_k=2, max_per_img=5)
    v = np.asarray(res.valid)
    assert v.sum() == 2
    assert set(np.asarray(res.labels)[v].tolist()) == {0, 2}
