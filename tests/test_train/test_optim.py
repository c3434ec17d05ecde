import jax
import jax.numpy as jnp
import numpy as np

from tpudet.train.ema import ema_momentum, ema_update
from tpudet.train.optim import (YoloSGDConfig, cosine_lr, global_norm_clip,
                                make_yolo_sgd, warmup_factors)


def torch_sgd_reference(p, g, buf, lr, momentum, wd, nesterov=True):
    """Independent scalar re-derivation of torch SGD semantics."""
    d = g + wd * p
    buf = momentum * buf + d
    if nesterov:
        d = d + momentum * buf
    else:
        d = buf
    return p - lr * d, buf


def test_sgd_matches_torch_semantics():
    cfg = YoloSGDConfig(lr=0.1, momentum=0.9, weight_decay=0.01,
                        warmup_iters=0, total_steps=1000000,
                        grad_clip_norm=1e9)
    init_fn, update_fn = make_yolo_sgd(cfg)
    params = {'conv': {'kernel': jnp.ones((2, 2, 2, 2)) * 0.5}}
    state = init_fn(params)
    g = jax.tree.map(lambda x: jnp.ones_like(x) * 0.1, params)

    p_ref, buf_ref = 0.5, 0.0
    p_state = params
    for step in range(3):
        p_state, state, _ = update_fn(g, state, p_state, jnp.asarray(step))
        p_ref, buf_ref = torch_sgd_reference(p_ref, 0.1, buf_ref, 0.1, 0.9,
                                             0.01)
        np.testing.assert_allclose(
            np.asarray(p_state['conv']['kernel']).ravel()[0], p_ref,
            rtol=1e-5)


def test_bias_group_no_decay_and_warmup_ratios():
    cfg = YoloSGDConfig(lr=0.01, warmup_iters=100,
                        lr_bias_warmup_ratio=10., lr_weight_warmup_ratio=0.,
                        momentum_warmup_ratio=0.95)
    in_warm, w, b, m = warmup_factors(jnp.asarray(0), cfg)
    assert bool(in_warm)
    np.testing.assert_allclose(w, 0.0)
    np.testing.assert_allclose(b, 10.0)
    np.testing.assert_allclose(m, 0.95)
    in_warm, w, b, m = warmup_factors(jnp.asarray(100), cfg)
    np.testing.assert_allclose([w, b, m], [1., 1., 1.])

    # bias must not be weight-decayed: zero grads leave bias unchanged at
    # step after warmup
    cfg2 = YoloSGDConfig(lr=0.1, momentum=0.0, weight_decay=0.5,
                         warmup_iters=0, grad_clip_norm=1e9)
    init_fn, update_fn = make_yolo_sgd(cfg2)
    params = {'conv': {'kernel': jnp.ones((3, 3, 4, 4)),
                       'bias': jnp.ones((4,))},
              'bn': {'scale': jnp.ones((4,)), 'bias': jnp.ones((4,))}}
    zg = jax.tree.map(jnp.zeros_like, params)
    new_p, _, _ = update_fn(zg, init_fn(params), params, jnp.asarray(10))
    np.testing.assert_allclose(new_p['conv']['bias'], 1.0)
    np.testing.assert_allclose(new_p['bn']['scale'], 1.0)
    np.testing.assert_allclose(new_p['bn']['bias'], 1.0)
    assert (np.asarray(new_p['conv']['kernel']) < 1.0).all()  # decayed


def test_cosine_schedule_endpoints():
    cfg = YoloSGDConfig(lr=0.01, min_lr_ratio=0.2, total_steps=1000)
    np.testing.assert_allclose(cosine_lr(jnp.asarray(0), cfg), 0.01,
                               rtol=1e-6)
    np.testing.assert_allclose(cosine_lr(jnp.asarray(1000), cfg), 0.002,
                               rtol=1e-6)
    mid = float(cosine_lr(jnp.asarray(500), cfg))
    np.testing.assert_allclose(mid, (0.01 + 0.002) / 2, rtol=1e-6)


def test_grad_clip_global_norm():
    g = {'a': jnp.ones((10,)) * 3.0}  # norm = sqrt(90) ~ 9.49
    clipped, norm = global_norm_clip(g, 1.0)
    np.testing.assert_allclose(norm, np.sqrt(90), rtol=1e-5)
    clipped_norm = float(jnp.linalg.norm(clipped['a']))
    np.testing.assert_allclose(clipped_norm, 1.0, rtol=1e-4)
    # under the limit: untouched
    same, _ = global_norm_clip(g, 100.0)
    np.testing.assert_allclose(same['a'], g['a'])


def test_ema_warmup_and_blend():
    # momentum ramps from 0 (reference ema_hooks.py:88-89)
    np.testing.assert_allclose(ema_momentum(jnp.asarray(0), 0.9999, 2000), 0.)
    m = float(ema_momentum(jnp.asarray(2000), 0.9999, 2000))
    np.testing.assert_allclose(m, 0.9999 * (1 - np.exp(-1)), rtol=1e-5)

    ema = {'w': jnp.zeros(3), 'n': jnp.zeros(3, jnp.int32)}
    online = {'w': jnp.ones(3), 'n': jnp.ones(3, jnp.int32) * 7}
    out = ema_update(ema, online, 0.9)
    np.testing.assert_allclose(out['w'], 0.1, rtol=1e-6)
    # non-float copied verbatim (reference :94-95)
    np.testing.assert_array_equal(out['n'], 7)


def test_adam_matches_torch_semantics():
    """Adam branch vs an independent scalar torch-Adam rederivation."""
    cfg = YoloSGDConfig(lr=0.001, weight_decay=0.0, warmup_iters=0,
                        total_steps=10**6, grad_clip_norm=1e9,
                        opt_type='adam', policy='fixed')
    init_fn, update_fn = make_yolo_sgd(cfg)
    params = {'conv': {'kernel': jnp.ones((2, 2, 2, 2)) * 0.5}}
    state = init_fn(params)

    p_ref, m_ref, v_ref = 0.5, 0.0, 0.0
    b1, b2, eps = 0.9, 0.999, 1e-8
    p_state = params
    for step in range(4):
        g_val = 0.1 * (step + 1)
        g = jax.tree.map(lambda x: jnp.ones_like(x) * g_val, params)
        p_state, state, _ = update_fn(g, state, p_state, jnp.asarray(step))
        m_ref = b1 * m_ref + (1 - b1) * g_val
        v_ref = b2 * v_ref + (1 - b2) * g_val**2
        mh = m_ref / (1 - b1**(step + 1))
        vh = v_ref / (1 - b2**(step + 1))
        p_ref = p_ref - 0.001 * mh / (vh**0.5 + eps)
        np.testing.assert_allclose(
            np.asarray(p_state['conv']['kernel']).ravel()[0], p_ref,
            rtol=1e-5)
