import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models import losses as L


def test_bce_matches_manual():
    pred = jnp.asarray([0.0, 2.0, -2.0])
    target = jnp.asarray([0.0, 1.0, 0.0])
    manual = -(target * jax.nn.log_sigmoid(pred) +
               (1 - target) * jax.nn.log_sigmoid(-pred))
    got = L.binary_cross_entropy_with_logits(pred, target)
    np.testing.assert_allclose(np.asarray(got), np.asarray(manual),
                               rtol=1e-5)


def test_giou_loss_zero_for_perfect():
    b = jnp.asarray([[0., 0., 10., 10.]])
    assert float(L.giou_loss(b, b)) < 1e-5
    # disjoint: loss > 1
    c = jnp.asarray([[20., 20., 30., 30.]])
    assert float(L.giou_loss(b, c)) > 1.0


def test_focal_down_weights_easy_negatives():
    pred = jnp.asarray([[-6.0], [0.0]])  # easy vs hard negative
    target = jnp.zeros((2, 1))
    per = L.sigmoid_focal_loss(pred, target, reduction='none')
    assert float(per[0, 0]) < float(per[1, 0]) * 1e-2


def test_varifocal_positive_weighting():
    pred = jnp.asarray([[0.0], [0.0]])
    # positive with quality 0.9 vs negative
    tgt = jnp.asarray([[0.9], [0.0]])
    per = L.varifocal_loss(pred, tgt, reduction='none')
    assert float(per[0, 0]) > float(per[1, 0])


def test_quality_focal_loss_background():
    pred = jnp.zeros((2, 4))
    labels = jnp.asarray([1, 4])  # class 1 pos, 4 == background
    scores = jnp.asarray([0.8, 0.0])
    loss = L.quality_focal_loss(pred, labels, scores)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_distribution_focal_loss_peaks_at_target():
    # logits strongly peaked at the right bin -> small loss
    pred_good = jnp.asarray([[0., 10., 10., 0.]])  # target 1.5
    pred_bad = jnp.asarray([[10., 0., 0., 10.]])
    t = jnp.asarray([1.5])
    assert float(L.distribution_focal_loss(pred_good, t)) < \
        float(L.distribution_focal_loss(pred_bad, t))


def test_balanced_l1_close_to_l1_for_large_error():
    pred = jnp.asarray([10.0])
    tgt = jnp.asarray([0.0])
    bl1 = float(L.balanced_l1_loss(pred, tgt, gamma=1.5))
    assert 10.0 < bl1 < 20.0


def test_ghm_c_runs():
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.randn(32, 4).astype(np.float32))
    target = jnp.asarray((rng.rand(32, 4) > 0.8).astype(np.float32))
    loss = L.ghm_c_loss(pred, target)
    assert np.isfinite(float(loss)) and float(loss) > 0


def _ghm_r_oracle(pred, target, label_weight, mu=0.02, bins=10,
                  loss_weight=1.0):
    """Numpy re-derivation of the reference GHMR forward loop
    (ghm_loss.py:125-170, momentum=0)."""
    edges = np.arange(bins + 1, dtype=np.float64) / bins
    edges[-1] = 1e3
    diff = pred - target
    loss = np.sqrt(diff * diff + mu * mu) - mu
    g = np.abs(diff / np.sqrt(mu * mu + diff * diff))
    weights = np.zeros_like(g)
    valid = label_weight > 0
    tot = max(label_weight.sum(), 1.0)
    n = 0
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = inds.sum()
        if num_in_bin > 0:
            n += 1
            weights[inds] = tot / num_in_bin
    if n > 0:
        weights /= n
    return loss_weight * (loss * weights).sum() / tot


def test_ghm_r_matches_reference_loop():
    rng = np.random.RandomState(0)
    pred = rng.randn(64, 4).astype(np.float32)
    target = rng.randn(64, 4).astype(np.float32) * 0.5
    lw = (rng.rand(64, 4) > 0.3).astype(np.float32)
    want = _ghm_r_oracle(pred.astype(np.float64), target.astype(np.float64),
                         lw.astype(np.float64), loss_weight=10.0)
    got = float(L.ghm_r_loss(jnp.asarray(pred), jnp.asarray(target),
                             jnp.asarray(lw), loss_weight=10.0))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_ghm_r_all_invalid_is_finite():
    pred = jnp.zeros((8, 4))
    got = float(L.ghm_r_loss(pred, pred, jnp.zeros((8, 4))))
    assert np.isfinite(got) and got == 0.0


def test_ghm_r_gradient_finite():
    rng = np.random.RandomState(1)
    pred = jnp.asarray(rng.randn(16, 4).astype(np.float32))
    target = jnp.asarray(rng.randn(16, 4).astype(np.float32))
    g = jax.grad(lambda p: L.ghm_r_loss(p, target))(pred)
    assert np.isfinite(np.asarray(g)).all()
