"""dense_class_nms (the uncapped nms_pre=-1 path every shipped YOLO config
runs) must agree exactly with per-class sequential greedy NMS merged and
truncated by score — i.e. the reference multiclass_nms semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.core.nms import (NEG_INF, batched_dense_class_nms,
                             dense_class_nms, nms_padded_scan)

from .test_nms import random_boxes


def _oracle(boxes, scores, score_thr, iou_thr, max_per_img, valid=None):
    """Per-class scan NMS -> merge -> stable sort by score -> truncate."""
    n, C = scores.shape
    dets = []
    for c in range(C):
        v = scores[:, c] > score_thr
        if valid is not None:
            v &= valid
        ki, kv = nms_padded_scan(jnp.asarray(boxes),
                                 jnp.asarray(scores[:, c]), iou_thr,
                                 max_per_img, jnp.asarray(v))
        for i in np.asarray(ki)[np.asarray(kv)]:
            dets.append((scores[i, c], c, i))
    # stable descending sort on score (ties keep class-then-index order,
    # matching the stable variadic sort in dense_class_nms)
    dets.sort(key=lambda t: -t[0])
    return dets[:max_per_img]


def _case(n, C, seed, spread, sparse=False):
    rng = np.random.RandomState(seed)
    boxes = random_boxes(n, seed, spread=spread)
    scores = rng.rand(n, C).astype(np.float32)
    if sparse:  # trained-model-like: most below threshold
        scores = scores * (rng.rand(n, C) < 0.05)
    valid = rng.rand(n) > 0.1
    return boxes, scores, valid


def test_dense_equals_per_class_oracle():
    for seed, sparse in [(0, False), (1, False), (2, True), (3, True)]:
        boxes, scores, valid = _case(150, 7, seed, spread=60.)
        res = dense_class_nms(jnp.asarray(boxes), jnp.asarray(scores),
                              0.05, 0.5, 40, jnp.asarray(valid))
        got = [(float(s), int(l)) for s, l, v in
               zip(np.asarray(res.scores), np.asarray(res.labels),
                   np.asarray(res.valid)) if v]
        want = [(float(s), int(c)) for s, c, _ in
                _oracle(boxes, scores, 0.05, 0.5, 40, valid)]
        assert len(got) == len(want), (seed, len(got), len(want))
        for (gs, gl), (ws, wl) in zip(got, want):
            assert gl == wl and abs(gs - ws) < 1e-6, (seed, got, want)


def test_dense_boxes_match_oracle():
    boxes, scores, valid = _case(120, 5, 11, spread=50.)
    res = dense_class_nms(jnp.asarray(boxes), jnp.asarray(scores),
                          0.05, 0.5, 30, jnp.asarray(valid))
    want = _oracle(boxes, scores, 0.05, 0.5, 30, valid)
    nv = int(np.sum(np.asarray(res.valid)))
    assert nv == len(want)
    for k in range(nv):
        _, _, i = want[k]
        np.testing.assert_allclose(np.asarray(res.bboxes)[k], boxes[i],
                                   rtol=1e-6)


def test_dense_single_class_agnostic():
    """C=1 (class_agnostic YOLO) degenerates to plain NMS."""
    boxes, scores, valid = _case(100, 1, 5, spread=40.)
    res = dense_class_nms(jnp.asarray(boxes), jnp.asarray(scores),
                          0.05, 0.5, 20, jnp.asarray(valid))
    want = _oracle(boxes, scores, 0.05, 0.5, 20, valid)
    got_l = np.asarray(res.labels)[np.asarray(res.valid)]
    assert len(got_l) == len(want) and (got_l == 0).all()


def test_dense_all_below_threshold():
    boxes = jnp.asarray(random_boxes(64, 0, spread=50.))
    scores = jnp.full((64, 3), 0.0001, jnp.float32)
    res = dense_class_nms(boxes, scores, 0.001, 0.5, 10)
    assert not bool(jnp.any(res.valid))
    assert (np.asarray(res.labels) == -1).all()


def test_batched_matches_single():
    cases = [_case(96, 4, s, spread=45.) for s in range(3)]
    boxes = jnp.stack([jnp.asarray(b) for b, _, _ in cases])
    scores = jnp.stack([jnp.asarray(s) for _, s, _ in cases])
    valid = jnp.stack([jnp.asarray(v) for _, _, v in cases])
    batched = batched_dense_class_nms(boxes, scores, 0.05, 0.5, 25,
                                      valid=valid)
    for i in range(3):
        single = dense_class_nms(boxes[i], scores[i], 0.05, 0.5, 25,
                                 valid[i])
        for a, b in zip(batched, single):
            np.testing.assert_array_equal(np.asarray(a[i]), np.asarray(b))
