"""CARAFE op/neck and FPG grid neck."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_neck
from tpudet.ops.carafe import carafe


def test_carafe_uniform_kernels_are_nearest_average():
    """Uniform 1/k^2 kernels average the k x k neighborhood."""
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    k = 3
    kernels = jnp.full((1, 8, 8, k * k), 1.0 / (k * k))
    out = carafe(x, kernels, k_up=k, scale=2)
    assert out.shape == (1, 8, 8, 1)
    # center source cell (1,1) has full 3x3 neighborhood: mean of values
    expect = float(jnp.mean(x[0, 0:3, 0:3, 0]))
    np.testing.assert_allclose(float(out[0, 2, 2, 0]), expect, atol=1e-5)
    # one-hot kernel on the center tap reproduces the source pixel
    onehot = jnp.zeros((1, 8, 8, 9)).at[..., 4].set(1.0)
    out2 = carafe(x, onehot, k_up=3, scale=2)
    np.testing.assert_allclose(np.asarray(out2[0, ::2, ::2, 0]),
                               np.asarray(x[0, :, :, 0]), atol=1e-5)


def test_fpn_carafe_shapes():
    neck = build_neck(dict(type='FPN_CARAFE',
                           in_channels=[16, 32, 64, 128], out_channels=16,
                           num_outs=5))
    ins = tuple(jnp.zeros((1, s, s, c))
                for s, c in zip((32, 16, 8, 4), (16, 32, 64, 128)))
    variables = neck.init(jax.random.PRNGKey(0), ins)
    outs = neck.apply(variables, ins)
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4, 2]
    assert all(o.shape[-1] == 16 for o in outs)


def test_fpg_shapes_and_skip_schedule():
    neck = build_neck(dict(type='FPG', in_channels=[16, 32, 64, 128],
                           out_channels=16, inter_channels=16,
                           num_outs=5, stack_times=5,
                           skip_inds=[(0, 1, 2, 3), (0, 1, 2), (0, 1),
                                      (0,), ()]))
    ins = tuple(jnp.zeros((1, s, s, c))
                for s, c in zip((32, 16, 8, 4), (16, 32, 64, 128)))
    variables = neck.init(jax.random.PRNGKey(0), ins)
    outs, _ = neck.apply(variables, ins, True, mutable=['batch_stats'])
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4, 2]
    # staircase schedule: level 0 has transitions only at stack 4
    params = variables['params']
    assert 's4_l0_lateral' in params and 's0_l0_lateral' not in params
    assert 's0_l4_lateral' in params
