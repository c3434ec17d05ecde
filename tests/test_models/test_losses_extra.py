"""Tests for gaussian focal / AE / KD losses and accuracy."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models import losses as L


def test_gaussian_focal_loss_peak_and_background():
    pred = jnp.asarray([[0.9, 0.1], [0.5, 0.5]])
    tgt = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    loss = L.gaussian_focal_loss(pred, tgt, reduction='none')
    loss = np.asarray(loss)
    # confident positive (0.9 @ target 1) -> small loss
    assert loss[0, 0] < 0.01
    # confident wrong negative contributes more than confident right one
    assert loss[1, 0] > loss[0, 1]
    # neg weight (1-t)^gamma kills loss where target is ~1 but pred low
    near_pos = L.gaussian_focal_loss(
        jnp.asarray([[0.1]]), jnp.asarray([[0.99]]), reduction='none')
    assert float(near_pos[0, 0]) < 0.01


def test_ae_loss_pull_push():
    # two objects with identical tl/br embeddings per object, far apart
    tl = jnp.asarray([1.0, 5.0, 0.0])
    br = jnp.asarray([1.0, 5.0, 0.0])
    valid = jnp.asarray([True, True, False])
    pull, push = L.ae_loss(tl, br, valid)
    assert float(pull) == 0.0  # corners agree -> no pull loss
    assert float(push) == 0.0  # means 4 apart > margin 1 -> no push loss

    # same embedding for both objects -> max push, still no pull
    tl2 = jnp.asarray([2.0, 2.0, 0.0])
    pull2, push2 = L.ae_loss(tl2, tl2, valid)
    assert float(pull2) == 0.0
    assert float(push2) > 0  # margin violation

    # corner disagreement -> pull loss
    pull3, _ = L.ae_loss(jnp.asarray([0.0, 5.0, 0.0]),
                         jnp.asarray([2.0, 5.0, 0.0]), valid)
    assert float(pull3) > 0

    # empty image
    pull4, push4 = L.ae_loss(tl, br, jnp.zeros(3, bool))
    assert float(pull4) == 0.0 and float(push4) == 0.0


def test_kd_kl_div_matches_direct():
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.randn(4, 5).astype(np.float32))
    soft = jnp.asarray(rng.randn(4, 5).astype(np.float32))
    T = 2.0
    out = L.kd_kl_div_loss(pred, soft, T=T, reduction='none')
    # direct: mean_c KL(softmax(soft/T) || softmax(pred/T)) * T^2
    t = jax.nn.softmax(soft / T, -1)
    lp = jax.nn.log_softmax(pred / T, -1)
    ref = np.mean(np.asarray(t) * (np.log(np.asarray(t)) - np.asarray(lp)),
                  -1) * T * T
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5)
    # identical logits -> zero loss
    z = L.kd_kl_div_loss(pred, pred, T=T)
    assert abs(float(z)) < 1e-6


def test_accuracy_topk_thresh():
    pred = jnp.asarray([[0.9, 0.05, 0.05], [0.1, 0.3, 0.6], [0.4, 0.5, 0.1]])
    target = jnp.asarray([0, 2, 0])
    np.testing.assert_allclose(float(L.accuracy(pred, target, topk=1)),
                               200.0 / 3, rtol=1e-5)
    assert float(L.accuracy(pred, target, topk=2)) == 100.0
    # threshold kills the 0.4-score correct prediction
    np.testing.assert_allclose(
        float(L.accuracy(pred, target, topk=2, thresh=0.45)), 200.0 / 3,
        rtol=1e-5)
