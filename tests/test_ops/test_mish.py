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
