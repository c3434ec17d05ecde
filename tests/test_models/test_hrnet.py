"""HRNet backbone tests: branch shapes, fusion, HRFPN integration."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_backbone, build_neck


def tiny_extra(w=8):
    return dict(
        stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                    num_blocks=(1,), num_channels=(8,)),
        stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                    num_blocks=(1, 1), num_channels=(w, w * 2)),
        stage3=dict(num_modules=2, num_branches=3, block='BASIC',
                    num_blocks=(1, 1, 1), num_channels=(w, w * 2, w * 4)),
        stage4=dict(num_modules=1, num_branches=4, block='BASIC',
                    num_blocks=(1, 1, 1, 1),
                    num_channels=(w, w * 2, w * 4, w * 8)))


def test_hrnet_multibranch_shapes():
    model = build_backbone(dict(type='HRNet', extra=tiny_extra()))
    x = jnp.zeros((1, 64, 64, 3))
    vs = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(vs, x)
    assert len(outs) == 4
    for i, o in enumerate(outs):
        assert o.shape == (1, 16 >> i, 16 >> i, 8 << i), (i, o.shape)


def test_hrnet_with_hrfpn():
    model = build_backbone(dict(type='HRNet', extra=tiny_extra()))
    neck = build_neck(dict(type='HRFPN', in_channels=[8, 16, 32, 64],
                           out_channels=16, num_outs=5))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3).astype(
        np.float32))
    vs = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(vs, x)
    nvs = neck.init(jax.random.PRNGKey(1), feats)
    outs = neck.apply(nvs, feats)
    assert len(outs) == 5
    assert outs[0].shape == (1, 16, 16, 16)
    assert np.isfinite(np.asarray(outs[-1])).all()
