"""Lane-local candidate selection (`lane_topk_select` / `class_lane_nms`).

The selection is order-free (the downstream blocked greedy re-sorts) and
caps candidates per (class, 128-lane column) instead of per class; when
every lane holds at most `k_per_lane` above-threshold candidates of a
class, the selected SET equals the exact per-class top-k and the final
detections must equal `class_sorted_nms`'s exactly.
"""
import jax.numpy as jnp
import numpy as np

from tpudet.core.nms import (NEG_INF, class_lane_nms, class_sorted_nms,
                             lane_topk_select)


def _random_boxes(rng, n):
    xy = rng.rand(n, 2).astype(np.float32) * 600
    wh = rng.rand(n, 2).astype(np.float32) * 80 + 4
    return np.concatenate([xy, xy + wh], -1)


def test_select_set_equals_exact_topk_when_lanes_sparse():
    """<= k_per_lane candidates per lane per class -> exact selection."""
    rng = np.random.RandomState(0)
    n, c, k = 512, 5, 2
    boxes = _random_boxes(rng, n)
    # place at most k above-threshold candidates per (class, lane):
    # lane of index i is i % 128; use sublane rows 0..k-1 only
    scores = np.zeros((n, c), np.float32)
    scores[: k * 128] = rng.rand(k * 128, c) * 0.9 + 0.05
    svals, cand = lane_topk_select(jnp.asarray(boxes), jnp.asarray(scores),
                                   score_thr=0.01, k_per_lane=k)
    for ci in range(c):
        got = np.sort(np.asarray(svals[ci]))[::-1]
        exact = np.sort(scores[:, ci][scores[:, ci] > 0.01])[::-1]
        m = min(len(exact), len(got))
        np.testing.assert_array_equal(got[:m], exact[:m])
        assert (got[m:] < NEG_INF / 2).all()


def test_payload_matches_scores():
    """The einsum-pulled box payload belongs to the selected score."""
    rng = np.random.RandomState(1)
    n, c = 256, 3
    boxes = _random_boxes(rng, n)
    scores = rng.rand(n, c).astype(np.float32)
    svals, cand = lane_topk_select(jnp.asarray(boxes), jnp.asarray(scores),
                                   score_thr=0.2, k_per_lane=2)
    svals, cand = np.asarray(svals), np.asarray(cand)
    for ci in range(c):
        for p in range(svals.shape[1]):
            if svals[ci, p] < NEG_INF / 2:
                continue
            # find the candidate with this exact score in this class
            idx = np.nonzero(scores[:, ci] == svals[ci, p])[0]
            assert len(idx) >= 1
            assert any(np.allclose(cand[ci, p], boxes[i]) for i in idx)


def test_class_lane_nms_equals_class_sorted_when_sparse():
    rng = np.random.RandomState(2)
    n, c, k = 512, 4, 2
    boxes = _random_boxes(rng, n)
    scores = np.zeros((n, c), np.float32)
    scores[: k * 128] = rng.rand(k * 128, c)
    scores *= rng.rand(n, c) < 0.3  # sparsify further
    a = class_lane_nms(jnp.asarray(boxes), jnp.asarray(scores),
                       score_thr=0.05, iou_thr=0.65, max_per_img=50,
                       lane_pre=k)
    b = class_sorted_nms(jnp.asarray(boxes), jnp.asarray(scores),
                         score_thr=0.05, iou_thr=0.65, max_per_img=50,
                         class_pre=128 * k)
    va, vb = np.asarray(a.valid), np.asarray(b.valid)
    assert va.sum() == vb.sum() and va.sum() > 0
    np.testing.assert_allclose(np.asarray(a.bboxes)[va],
                               np.asarray(b.bboxes)[vb], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.labels)[va],
                                  np.asarray(b.labels)[vb])


def test_lane_cap_drops_excess_in_one_lane():
    """>k candidates of one class in ONE lane: only the k best survive
    selection (the documented approximation)."""
    n, c, k = 256, 1, 2
    boxes = _random_boxes(np.random.RandomState(3), n)
    scores = np.zeros((n, c), np.float32)
    # indices 0, 128 share... lane of i is i % 128; stack 4 candidates
    # into lane 5: indices 5, 133 (n=256 -> 2 sublanes only). Use n=512.
    n = 512
    boxes = _random_boxes(np.random.RandomState(3), n)
    scores = np.zeros((n, c), np.float32)
    lane = 5
    vals = [0.9, 0.8, 0.7, 0.6]
    for s_row, v in enumerate(vals):
        scores[s_row * 128 + lane, 0] = v
    svals, _ = lane_topk_select(jnp.asarray(boxes), jnp.asarray(scores),
                                score_thr=0.01, k_per_lane=k)
    kept = np.sort(np.asarray(svals[0]))[::-1]
    np.testing.assert_allclose(kept[:2], [0.9, 0.8], atol=1e-7)
    assert kept[2] < NEG_INF / 2  # 0.7 / 0.6 dropped by the lane cap


def test_valid_mask_respected():
    rng = np.random.RandomState(4)
    n, c = 256, 2
    boxes = _random_boxes(rng, n)
    scores = rng.rand(n, c).astype(np.float32)
    valid = rng.rand(n) < 0.5
    svals, _ = lane_topk_select(jnp.asarray(boxes), jnp.asarray(scores),
                                score_thr=0.0, k_per_lane=2,
                                valid=jnp.asarray(valid))
    svals = np.asarray(svals)
    masked_scores = scores.copy()
    masked_scores[~valid] = -1
    for ci in range(c):
        kept = svals[ci][svals[ci] > NEG_INF / 2]
        assert all(s in masked_scores[:, ci][valid] for s in kept)
