"""Deformable conv: zero-offset == regular conv; shift semantics; grads."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.ops.deform_conv import (DeformConv2d, ModulatedDeformConv2d,
                                    deform_conv2d, deform_sample)


def test_zero_offset_equals_dense_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    w = jnp.asarray(rng.rand(9, 3, 4).astype(np.float32))
    offsets = jnp.zeros((1, 8, 8, 18))
    out = deform_conv2d(x, offsets, w, kernel_size=3)
    # reference: lax conv with the same kernel, SAME (zero) padding
    wk = np.asarray(w).reshape(3, 3, 3, 4)
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(wk), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=1e-5)


def test_integer_offset_shifts_sampling():
    # 1x1 kernel with offset (dy=0, dx=1) must read the right neighbor
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    w = jnp.ones((1, 1, 1))
    offsets = jnp.zeros((1, 4, 4, 2)).at[..., 1].set(1.0)
    out = np.asarray(deform_conv2d(x, offsets, w, kernel_size=1))[0, :, :, 0]
    ref = np.asarray(x)[0, :, :, 0]
    np.testing.assert_allclose(out[:, :3], ref[:, 1:])
    np.testing.assert_allclose(out[:, 3], 0.0)  # outside -> zero


def test_fractional_offset_bilinear():
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    w = jnp.ones((1, 1, 1))
    offsets = jnp.zeros((1, 4, 4, 2)).at[..., 1].set(0.5)
    out = np.asarray(deform_conv2d(x, offsets, w, kernel_size=1))[0, 1, 1, 0]
    assert abs(out - 5.5) < 1e-5  # halfway between 5 and 6


def test_mask_scales_taps():
    x = jnp.ones((1, 4, 4, 2))
    w = jnp.ones((1, 2, 1))
    offsets = jnp.zeros((1, 4, 4, 2))
    mask = jnp.full((1, 4, 4, 1), 0.5)
    out = np.asarray(deform_conv2d(x, offsets, w, 1, mask=mask))
    np.testing.assert_allclose(out[0, 1, 1, 0], 1.0)  # 2 channels * 0.5


def test_modules_and_gradients():
    x = jnp.asarray(np.random.RandomState(1).rand(2, 8, 8, 4).astype(
        np.float32))
    mod = ModulatedDeformConv2d(features=6)
    vs = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(vs, x)
    assert out.shape == (2, 8, 8, 6)

    def loss(params):
        return jnp.sum(mod.apply(params, x)**2)

    g = jax.grad(loss)(vs)
    norms = [float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    # kernel grads flow; conv_offset starts at zero but still gets grads
    assert sum(norms) > 0

    dc = DeformConv2d(features=5)
    offs = jnp.zeros((2, 8, 8, 18))
    vs2 = dc.init(jax.random.PRNGKey(0), x, offs)
    assert dc.apply(vs2, x, offs).shape == (2, 8, 8, 5)
