"""Space-to-depth stem is an EXACT rewrite of the standard stem.

The block-space stem (darknet_csp.py::S2DStemConv/S2DDownConv) must produce
the same params tree, outputs, batch-stats updates, and parameter gradients
as the standard ConvModule path — it is a pure layout transformation of the
same arithmetic (kernels zero-packed into block space).

Exactness is pinned at the unit level (repacked conv == direct conv to fp32
epsilon; phase BN == flax BN). Whole-backbone comparisons use scale-aware
tolerances: in eval mode BN is an identity affine at init (running var 1),
so fp32 reassociation noise (~1e-7 relative per conv) compounds through ~20
unnormalized convs — float64 agreement was verified at ~1e-8 relative."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpudet.models.backbones.darknet_csp import (DarknetCSP, PhaseBatchNorm,
                                                 _repack_down_kernel,
                                                 _repack_stem_kernel,
                                                 space_to_depth)

DN = ('NHWC', 'HWIO', 'NHWC')


def _build(s2d: bool, out_indices=(3, 4, 5)):
    return DarknetCSP(scale='v4s5p', out_indices=out_indices,
                      space_to_depth_stem=s2d, dtype=jnp.float32)


def _img(b=2, s=64):
    return jnp.asarray(
        np.random.RandomState(0).rand(b, s, s, 3).astype(np.float32))


def test_repacked_stem_conv_exact():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 8).astype(np.float32))
    y_ref = lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=DN)
    yb = lax.conv_general_dilated(space_to_depth(x), _repack_stem_kernel(w),
                                  (1, 1), ((1, 1), (1, 1)),
                                  dimension_numbers=DN)
    b, h2, w2, _ = yb.shape
    y = yb.reshape(b, h2, w2, 2, 2, 8).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(b, 16, 16, 8)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_repacked_down_conv_exact():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32))
    y_ref = lax.conv_general_dilated(x, w, (2, 2), ((1, 1), (1, 1)),
                                     dimension_numbers=DN)
    y = lax.conv_general_dilated(space_to_depth(x), _repack_down_kernel(w),
                                 (1, 1), ((1, 0), (1, 0)),
                                 dimension_numbers=DN)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_phase_bn_matches_flax_bn():
    """PhaseBatchNorm on the phase-packed tensor == flax BatchNorm on the
    un-packed tensor (stats, outputs, running updates)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32)) * 3 + 1
    xs = space_to_depth(x)

    ref = nn.BatchNorm(use_running_average=False, momentum=0.97,
                       epsilon=1e-3)
    vr = ref.init(jax.random.PRNGKey(0), x)
    yr, mr = ref.apply(vr, x, mutable=['batch_stats'])

    pbn = PhaseBatchNorm(6, 1e-3, 0.97)
    vp = pbn.init(jax.random.PRNGKey(0), xs, train=True)
    yp, mp = pbn.apply(vp, xs, train=True, mutable=['batch_stats'])
    b, h2, w2, _ = yp.shape
    y = yp.reshape(b, h2, w2, 2, 2, 6).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(x.shape)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-5, atol=1e-5)
    for k in ('mean', 'var'):
        np.testing.assert_allclose(
            np.asarray(mp['batch_stats'][k]),
            np.asarray(mr['batch_stats'][k]), rtol=1e-5, atol=1e-6)


def test_param_tree_identical():
    img = _img()
    va = _build(False).init(jax.random.PRNGKey(0), img)
    vb = _build(True).init(jax.random.PRNGKey(0), img)
    assert (jax.tree_util.tree_structure(va)
            == jax.tree_util.tree_structure(vb))
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(va),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(vb),
                   key=lambda kv: str(kv[0]))):
        assert str(ka) == str(kb) and a.shape == b.shape, (ka, kb)


def _assert_close_scaled(a, b, rel=2e-3, msg=''):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    scale = max(np.abs(a).max(), 1.0)
    np.testing.assert_allclose(a, b, rtol=0, atol=rel * scale, err_msg=msg)


def test_eval_outputs_match():
    img = _img()
    variables = _build(False).init(jax.random.PRNGKey(1), img)
    outs_a = _build(False).apply(variables, img)
    outs_b = _build(True).apply(variables, img)
    for a, b in zip(outs_a, outs_b):
        _assert_close_scaled(a, b)


def test_train_outputs_and_stats_match():
    img = _img()
    variables = _build(False).init(jax.random.PRNGKey(2), img)
    outs_a, mut_a = _build(False).apply(variables, img, train=True,
                                        mutable=['batch_stats'])
    outs_b, mut_b = _build(True).apply(variables, img, train=True,
                                       mutable=['batch_stats'])
    for a, b in zip(outs_a, outs_b):
        _assert_close_scaled(a, b)
    leaves_a = jax.tree_util.tree_leaves_with_path(mut_a['batch_stats'])
    leaves_b = jax.tree_util.tree_leaves_with_path(mut_b['batch_stats'])
    for (ka, a), (kb, b) in zip(sorted(leaves_a, key=lambda kv: str(kv[0])),
                                sorted(leaves_b, key=lambda kv: str(kv[0]))):
        _assert_close_scaled(a, b, msg=str(ka))


def test_param_gradients_match():
    img = _img()
    variables = _build(False).init(jax.random.PRNGKey(3), img)

    def loss(params, model):
        outs, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            img, train=True, mutable=['batch_stats'])
        return sum(jnp.mean(jnp.square(o)) for o in outs)

    ga = jax.grad(loss)(variables['params'], _build(False))
    gb = jax.grad(loss)(variables['params'], _build(True))
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(ga),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(gb),
                   key=lambda kv: str(kv[0]))):
        _assert_close_scaled(a, b, rel=5e-3, msg=str(ka))


def test_odd_input_falls_back():
    """Odd spatial sizes cannot block: the flag silently falls back to the
    standard stem (same params, so this is purely a path choice)."""
    img = jnp.asarray(
        np.random.RandomState(0).rand(1, 65, 65, 3).astype(np.float32))
    model = _build(True)
    variables = model.init(jax.random.PRNGKey(0), img)
    outs = model.apply(variables, img)
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)
