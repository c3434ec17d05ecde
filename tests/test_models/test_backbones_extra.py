"""Backbone breadth tests: ResNeXt, RegNet, SSDVGG shape contracts."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.backbones.regnet import RegNet, generate_regnet
from tpudet.models.builder import build_backbone


def test_generate_regnet_produces_4_stages():
    widths, depths = generate_regnet(24, 24.48, 2.54, 22)
    assert len(widths) == 4
    assert sum(depths) == 22
    assert all(w % 8 == 0 for w in widths)


def test_regnet_forward_shapes():
    model = build_backbone(dict(type='RegNet', arch='regnetx_400mf',
                                out_indices=[0, 1, 2, 3]))
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    widths = RegNet.out_channels('regnetx_400mf', (0, 1, 2, 3))
    assert len(outs) == 4
    for o, w, stride in zip(outs, widths, (4, 8, 16, 32)):
        assert o.shape == (1, 64 // stride, 64 // stride, w)


def test_resnext_grouped_bottleneck():
    model = build_backbone(dict(type='ResNeXt', depth=50, groups=32,
                                base_width=4, out_indices=[3]))
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert outs[0].shape == (1, 2, 2, 2048)
    # grouped conv kernel: (3, 3, width/groups, width)
    k = variables['params']['layer1_0']['conv2']['kernel']
    assert k.shape[2] * 32 == k.shape[3]


def test_res2net_forward_shapes():
    model = build_backbone(dict(type='Res2Net', depth=50, scales=4,
                                out_indices=[0, 3]))
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert outs[0].shape == (1, 16, 16, 256)
    assert outs[1].shape == (1, 2, 2, 2048)
    # hierarchical 3x3s exist per scale chunk (minus the identity chunk)
    assert 'conv2_1' in variables['params']['layer1_1']
    assert 'conv2_3' in variables['params']['layer1_1']
