"""class_sorted_nms (the per-class-budget capped path) must implement the
reference multiclass_nms semantics restricted to the top ``class_pre``
candidates of each class column: per-class greedy NMS on that candidate
set, merged across classes by score, truncated at ``max_per_img``. With
``class_pre >= N`` it must equal the exact uncapped path bit-for-bit."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.core.nms import (batched_class_sorted_nms, class_sorted_nms,
                             dense_class_nms, nms_padded_scan)

from .test_nms import random_boxes


def _oracle(boxes, scores, score_thr, iou_thr, max_per_img, class_pre,
            valid=None):
    """Per-class: top class_pre candidates -> scan NMS -> merge -> sort."""
    n, C = scores.shape
    dets = []
    for c in range(C):
        v = scores[:, c] > score_thr
        if valid is not None:
            v &= valid
        masked = np.where(v, scores[:, c], -np.inf)
        cand = np.argsort(-masked, kind='stable')[:class_pre]
        cv = masked[cand] > -np.inf
        ki, kv = nms_padded_scan(jnp.asarray(boxes[cand]),
                                 jnp.asarray(scores[cand, c]), iou_thr,
                                 max_per_img, jnp.asarray(cv))
        for i in np.asarray(ki)[np.asarray(kv)]:
            dets.append((scores[cand[i], c], c, cand[i]))
    dets.sort(key=lambda t: -t[0])
    return dets[:max_per_img]


def _case(n, C, seed, spread, sparse=False):
    rng = np.random.RandomState(seed)
    boxes = random_boxes(n, seed, spread=spread)
    scores = rng.rand(n, C).astype(np.float32)
    if sparse:
        scores = scores * (rng.rand(n, C) < 0.05)
    valid = rng.rand(n) > 0.1
    return boxes, scores, valid


def test_class_sorted_equals_oracle():
    """Budget binds (class_pre < above-threshold per class): results must be
    the oracle's budget-restricted greedy solution, not the uncapped one."""
    for seed, sparse in [(0, False), (1, False), (2, True)]:
        boxes, scores, valid = _case(200, 6, seed, spread=60.)
        res = class_sorted_nms(jnp.asarray(boxes), jnp.asarray(scores),
                               0.05, 0.5, 40, class_pre=24,
                               valid=jnp.asarray(valid))
        want = _oracle(boxes, scores, 0.05, 0.5, 40, 24, valid)
        got = [(float(s), int(l)) for s, l, v in
               zip(np.asarray(res.scores), np.asarray(res.labels),
                   np.asarray(res.valid)) if v]
        assert len(got) == len(want), (seed, len(got), len(want))
        for (gs, gl), (ws, wl, _) in zip(got, want):
            assert gl == wl and abs(gs - ws) < 1e-6, (seed, got, want)


def test_class_sorted_boxes_match_oracle():
    boxes, scores, valid = _case(150, 4, 9, spread=50.)
    res = class_sorted_nms(jnp.asarray(boxes), jnp.asarray(scores),
                           0.05, 0.5, 30, class_pre=32,
                           valid=jnp.asarray(valid))
    want = _oracle(boxes, scores, 0.05, 0.5, 30, 32, valid)
    nv = int(np.sum(np.asarray(res.valid)))
    assert nv == len(want)
    for k in range(nv):
        _, _, i = want[k]
        np.testing.assert_allclose(np.asarray(res.bboxes)[k], boxes[i],
                                   rtol=1e-5, atol=1e-4)


def test_uncapped_budget_equals_dense_exact():
    """class_pre >= N: the budget never binds, so the result must equal the
    exact dense path (same detections, scores, labels, boxes)."""
    for seed in (3, 4):
        boxes, scores, valid = _case(120, 5, seed, spread=55.)
        a = class_sorted_nms(jnp.asarray(boxes), jnp.asarray(scores),
                             0.05, 0.5, 35, class_pre=120,
                             valid=jnp.asarray(valid))
        b = dense_class_nms(jnp.asarray(boxes), jnp.asarray(scores),
                            0.05, 0.5, 35, jnp.asarray(valid))
        np.testing.assert_array_equal(np.asarray(a.valid),
                                      np.asarray(b.valid))
        m = np.asarray(a.valid)
        np.testing.assert_array_equal(np.asarray(a.labels)[m],
                                      np.asarray(b.labels)[m])
        np.testing.assert_allclose(np.asarray(a.scores)[m],
                                   np.asarray(b.scores)[m], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(a.bboxes)[m],
                                   np.asarray(b.bboxes)[m], rtol=1e-5,
                                   atol=1e-4)


def test_all_below_threshold():
    boxes = jnp.asarray(random_boxes(64, 0, spread=50.))
    scores = jnp.full((64, 3), 0.0001, jnp.float32)
    res = class_sorted_nms(boxes, scores, 0.001, 0.5, 10, class_pre=16)
    assert not bool(jnp.any(res.valid))
    assert (np.asarray(res.labels) == -1).all()


def test_batched_matches_single():
    cases = [_case(96, 4, s, spread=45.) for s in range(3)]
    boxes = jnp.stack([jnp.asarray(b) for b, _, _ in cases])
    scores = jnp.stack([jnp.asarray(s) for _, s, _ in cases])
    valid = jnp.stack([jnp.asarray(v) for _, _, v in cases])
    batched = batched_class_sorted_nms(boxes, scores, 0.05, 0.5, 25,
                                       class_pre=20, valid=valid)
    for i in range(3):
        single = class_sorted_nms(boxes[i], scores[i], 0.05, 0.5, 25,
                                  class_pre=20, valid=valid[i])
        for a, b in zip(batched, single):
            np.testing.assert_array_equal(np.asarray(a[i]), np.asarray(b))
