"""Mish op tests (reference test strategy: tests/test_models/
test_act_mish.py — closed-form check + grad check)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpudet.ops.mish import mish, mish_pallas, mish_reference


def test_mish_closed_form():
    x = jnp.asarray(np.linspace(-30, 30, 201, dtype=np.float32))
    want = x * np.tanh(np.log1p(np.exp(np.minimum(x, 20.0))) +
                       np.maximum(x - 20.0, 0))  # stable softplus
    got = mish_reference(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # no overflow at extremes
    assert np.isfinite(np.asarray(mish_reference(jnp.asarray([88.0])))).all()


def test_mish_gradient_matches_finite_difference():
    x = jnp.asarray(np.random.RandomState(0).randn(64).astype(np.float32))
    g = jax.grad(lambda a: jnp.sum(mish_reference(a)))(x)
    eps = 1e-3
    fd = (np.asarray(mish_reference(x + eps)) -
          np.asarray(mish_reference(x - eps))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), fd, atol=1e-3)


def test_mish_bf16_close_to_fp32():
    x = jnp.asarray(np.random.RandomState(1).randn(128).astype(np.float32))
    y32 = mish(x)
    y16 = mish(x.astype(jnp.bfloat16)).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32), atol=0.05)


@pytest.mark.skipif(jax.default_backend() != 'tpu',
                    reason='Pallas TPU kernel needs a TPU')
def test_mish_pallas_matches_reference_on_tpu():
    x = jnp.asarray(
        np.random.RandomState(0).randn(4, 64, 64, 128), jnp.bfloat16)
    y_p = jax.jit(mish_pallas)(x)
    y_r = jax.jit(mish_reference)(x)
    np.testing.assert_allclose(np.asarray(y_p, dtype=np.float32),
                               np.asarray(y_r, dtype=np.float32), atol=1e-2)
    g_p = jax.grad(lambda a: jnp.sum(mish_pallas(a).astype(jnp.float32)))(x)
    g_r = jax.grad(
        lambda a: jnp.sum(mish_reference(a).astype(jnp.float32)))(x)
    np.testing.assert_allclose(np.asarray(g_p, dtype=np.float32),
                               np.asarray(g_r, dtype=np.float32), atol=5e-3)


def test_mish_bf16_rational_form():
    """The bf16 fast path's one-exp rational identity
    tanh(softplus(x)) == u(u+2)/(u^2+2u+2), u=e^x: finite over the whole
    bf16-relevant range, bf16-round-noise close to the fp32 reference,
    exact limits at both tails, and a finite, correct gradient."""
    x = jnp.asarray(np.linspace(-90, 90, 40001, dtype=np.float32))
    y = np.asarray(mish(x.astype(jnp.bfloat16)), np.float32)
    assert np.isfinite(y).all()
    ref = np.asarray(mish_reference(x), np.float32)
    denom = np.maximum(np.abs(ref), 1e-3)
    err_rational = (np.abs(y - ref) / denom).max()
    # same error class as the literal bf16 softplus+tanh chain: a few
    # bf16 ulp (2^-8 mantissa) of compounded rounding, NOT a different
    # approximation regime
    xb = x.astype(jnp.bfloat16)
    y_chain = np.asarray(
        (xb * jnp.tanh(jax.nn.softplus(xb))), np.float32)
    err_chain = (np.abs(y_chain - ref) / denom).max()
    assert err_rational < 0.04, err_rational
    assert err_rational < max(2.5 * err_chain, 0.02), (
        err_rational, err_chain)
    # tails: mish(x) -> x for large x, -> 0 for very negative x
    big = mish(jnp.asarray([50.0, 300.0], jnp.bfloat16))
    np.testing.assert_array_equal(np.asarray(big, np.float32),
                                  [50.0, 300.0])
    neg = mish(jnp.asarray([-300.0], jnp.bfloat16))
    assert float(neg[0]) == 0.0
    # gradient finite everywhere incl. the clamp point and extremes
    g = jax.vmap(jax.grad(
        lambda a: mish(a).astype(jnp.float32)))(
            jnp.asarray([-300.0, -20.0, 0.0, 7.9, 8.0, 8.1, 300.0],
                        jnp.bfloat16))
    assert np.isfinite(np.asarray(g, np.float32)).all()
