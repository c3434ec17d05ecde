"""The blocked early-exit NMS must agree exactly with the sequential scan
(and so with the greedy reference) — including across block boundaries,
through the early exit, and under vmap. `nms_padded` dispatches to it above
BLOCKED_NMS_MIN_SIZE candidates, so this is the path every shipped config
(nms_pre=8192) runs."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.core.nms import (BLOCKED_NMS_MIN_SIZE, nms_blocked, nms_padded,
                             nms_padded_scan)

from .test_nms import random_boxes


def _dense_case(n, seed, spread):
    """Crowded boxes + random validity: long suppression chains guaranteed."""
    boxes = random_boxes(n, seed, spread=spread)
    scores = np.random.RandomState(seed + 50).rand(n).astype(np.float32)
    valid = np.random.RandomState(seed + 99).rand(n) > 0.15
    return jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)


def test_blocked_equals_scan_small_blocks():
    """Tiny block size forces many block iterations and cross-block
    suppression on a cheap input."""
    for seed in range(6):
        boxes, scores, valid = _dense_case(200, seed, spread=60.)
        for thr in (0.3, 0.5, 0.7):
            for max_out in (10, 40, 150):
                i1, v1 = nms_padded_scan(boxes, scores, thr, max_out, valid)
                i2, v2 = nms_blocked(boxes, scores, thr, max_out, valid,
                                     block=32)
                np.testing.assert_array_equal(
                    np.asarray(i1)[np.asarray(v1)],
                    np.asarray(i2)[np.asarray(v2)],
                    err_msg=f'seed={seed} thr={thr} max_out={max_out}')


def test_blocked_equals_scan_default_block():
    """Realistic shape: 2048 candidates, default block=512, small max_out
    (early exit fires mid-stream)."""
    for seed in range(3):
        boxes, scores, valid = _dense_case(2048, seed, spread=300.)
        i1, v1 = nms_padded_scan(boxes, scores, 0.5, 100, valid)
        i2, v2 = nms_blocked(boxes, scores, 0.5, 100, valid)
        np.testing.assert_array_equal(np.asarray(i1)[np.asarray(v1)],
                                      np.asarray(i2)[np.asarray(v2)])


def test_blocked_keep_exceeds_max_out_in_final_block():
    """Disjoint boxes (nothing suppresses anything): every candidate is a
    keep, so the max_out-th keep lands mid-block and the overflow must be
    dropped, not wrapped."""
    n, max_out = 100, 37
    xs = np.arange(n, dtype=np.float32) * 20.
    boxes = np.stack([xs, np.zeros(n, np.float32), xs + 10.,
                      np.full(n, 10., np.float32)], axis=1)
    scores = np.linspace(0.9, 0.1, n).astype(np.float32)
    i1, v1 = nms_padded_scan(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                             max_out)
    i2, v2 = nms_blocked(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                         max_out, block=16)
    assert int(np.sum(np.asarray(v2))) == max_out
    np.testing.assert_array_equal(np.asarray(i1)[np.asarray(v1)],
                                  np.asarray(i2)[np.asarray(v2)])


def test_blocked_all_invalid():
    boxes = jnp.asarray(random_boxes(64, 0, spread=50.))
    scores = jnp.ones((64,), jnp.float32)
    valid = jnp.zeros((64,), bool)
    idx, v = nms_blocked(boxes, scores, 0.5, 10, valid, block=16)
    assert not bool(jnp.any(v))


def test_blocked_under_vmap():
    """batched_nms runs this under vmap — while_loop must lift correctly
    and per-image results must still match the per-image scan."""
    batch = []
    for seed in range(4):
        batch.append(_dense_case(256, seed, spread=80.))
    boxes = jnp.stack([b for b, _, _ in batch])
    scores = jnp.stack([s for _, s, _ in batch])
    valid = jnp.stack([v for _, _, v in batch])
    i2, v2 = jax.vmap(
        lambda b, s, v: nms_blocked(b, s, 0.5, 50, v, block=32))(
            boxes, scores, valid)
    for i in range(4):
        i1, v1 = nms_padded_scan(boxes[i], scores[i], 0.5, 50, valid[i])
        np.testing.assert_array_equal(
            np.asarray(i1)[np.asarray(v1)],
            np.asarray(i2[i])[np.asarray(v2[i])], err_msg=f'img={i}')


def test_padded_dispatches_to_blocked_above_threshold():
    """nms_padded at K > BLOCKED_NMS_MIN_SIZE must equal the scan oracle
    (i.e. the dispatch to the blocked form changes nothing)."""
    n = BLOCKED_NMS_MIN_SIZE + 512
    boxes, scores, valid = _dense_case(n, 7, spread=250.)
    i1, v1 = nms_padded_scan(boxes, scores, 0.5, 80, valid)
    i2, v2 = nms_padded(boxes, scores, 0.5, 80, valid)
    np.testing.assert_array_equal(np.asarray(i1)[np.asarray(v1)],
                                  np.asarray(i2)[np.asarray(v2)])
