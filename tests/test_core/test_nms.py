import jax.numpy as jnp
import numpy as np

from tpudet.core.nms import multiclass_nms, nms_padded


def ref_greedy_nms(boxes, scores, iou_thr):
    """Independent numpy greedy hard-NMS (sorted by score, strictly-greater
    suppression) for parity checking."""
    order = np.argsort(-scores, kind='stable')
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(area_i + areas - inter, 1e-6)
        suppressed |= iou > iou_thr
    return np.array(keep)


def random_boxes(n, seed, spread=100.):
    rng = np.random.RandomState(seed)
    xy = rng.rand(n, 2).astype(np.float32) * spread
    wh = rng.rand(n, 2).astype(np.float32) * 40 + 1
    return np.concatenate([xy, xy + wh], axis=-1)


def test_nms_matches_greedy_reference():
    for seed in range(5):
        boxes = random_boxes(64, seed)
        scores = np.random.RandomState(seed + 100).rand(64).astype(np.float32)
        ref = ref_greedy_nms(boxes, scores, 0.5)
        keep_idx, keep_valid = nms_padded(
            jnp.asarray(boxes), jnp.asarray(scores), 0.5, 64)
        got = np.asarray(keep_idx)[np.asarray(keep_valid)]
        np.testing.assert_array_equal(got, ref)


def test_nms_truncation_is_prefix_of_full():
    boxes = random_boxes(128, 7)
    scores = np.random.RandomState(8).rand(128).astype(np.float32)
    full_idx, full_valid = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), 0.6, 128)
    trunc_idx, trunc_valid = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), 0.6, 10)
    full = np.asarray(full_idx)[np.asarray(full_valid)]
    trunc = np.asarray(trunc_idx)[np.asarray(trunc_valid)]
    np.testing.assert_array_equal(trunc, full[:len(trunc)])


def test_multiclass_nms_class_aware():
    # identical boxes, different classes: both must survive
    boxes = jnp.asarray(np.array([[0., 0., 10., 10.], [0., 0., 10., 10.]],
                                 dtype=np.float32))
    scores = np.zeros((2, 3), dtype=np.float32)
    scores[0, 0] = 0.9
    scores[1, 2] = 0.8
    res = multiclass_nms(boxes, jnp.asarray(scores), 0.05, 0.5, 10,
                         nms_pre=6)
    valid = np.asarray(res.valid)
    assert valid.sum() == 2
    labels = np.asarray(res.labels)[valid]
    assert set(labels.tolist()) == {0, 2}


def test_multiclass_nms_score_threshold_and_order():
    boxes = jnp.asarray(random_boxes(32, 3, spread=500.))
    rng = np.random.RandomState(4)
    scores = rng.rand(32, 5).astype(np.float32)
    scores[scores < 0.5] = 0.0
    res = multiclass_nms(boxes, jnp.asarray(scores), 0.5, 0.5, 50,
                         nms_pre=200)
    valid = np.asarray(res.valid)
    s = np.asarray(res.scores)[valid]
    assert (s > 0.5).all()
    assert (np.diff(s) <= 1e-6).all()  # descending


def test_multiclass_nms_empty():
    boxes = jnp.zeros((8, 4))
    scores = jnp.zeros((8, 3))
    res = multiclass_nms(boxes, scores, 0.1, 0.5, 5)
    assert not np.asarray(res.valid).any()
    assert (np.asarray(res.labels) == -1).all()


def test_topk_scores_exact_on_small_inputs():
    """topk_scores must be bit-exact below the approx threshold (covers
    every test-sized input; the approx path only engages above 32k)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpudet.core.nms import APPROX_TOPK_MIN_SIZE, topk_scores
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4096).astype(np.float32))
    v, i = topk_scores(x, 100)
    ve, ie = jax.lax.top_k(x, 100)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(ve))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ie))
    assert APPROX_TOPK_MIN_SIZE > 4096
