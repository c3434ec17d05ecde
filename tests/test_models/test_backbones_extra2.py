"""ResNeSt and TridentResNet backbone tests."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_backbone


def test_resnest_shapes_and_split_attention():
    model = build_backbone(dict(type='ResNeSt', depth=50,
                                out_indices=[0, 3]))
    x = jnp.zeros((1, 64, 64, 3))
    vs = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(vs, x)
    assert outs[0].shape == (1, 16, 16, 256)
    assert outs[1].shape == (1, 2, 2, 2048)
    # split-attention params exist: radix-grouped conv + fc1/fc2
    l10 = vs['params']['layer1_0']['conv2']
    assert 'fc1' in l10 and 'fc2' in l10
    # radix 2: conv produces channels * 2
    assert l10['conv']['kernel'].shape[-1] == 128


def test_resnest_radix_softmax_normalizes():
    from tpudet.models.backbones.resnest import SplitAttentionConv
    m = SplitAttentionConv(channels=8, radix=2)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 8).astype(
        np.float32))
    vs = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vs, x)
    assert out.shape == (2, 8, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_trident_resnet_branches():
    model = build_backbone(dict(type='TridentResNet', depth=50))
    x = jnp.zeros((2, 64, 64, 3))
    vs = model.init(jax.random.PRNGKey(0), x, train=True)
    # train: 3 branches concat along batch
    outs = model.apply(vs, x, train=True,
                       mutable=['batch_stats'])[0]
    assert outs[0].shape == (6, 2, 2, 2048)
    # eval: single test branch
    outs_eval = model.apply(vs, x)
    assert outs_eval[0].shape == (2, 2, 2, 2048)
    # trident conv2 kernel is shared across branches: one param per block
    keys = [k for k in vs['params'] if k.startswith('trident0')]
    assert 'trident0_conv2_kernel' in vs['params']


def test_resnet_dcn_stages():
    """DCNv2 bottlenecks (configs/dcn): zero-init offsets make the block
    numerically a plain conv at init; shape contract preserved."""
    import jax
    import jax.numpy as jnp
    from tpudet.models.builder import build_backbone
    bb = build_backbone(dict(type='ResNet', depth=50,
                             out_indices=[0, 1, 2, 3],
                             stage_with_dcn=[False, True, True, True]))
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(bb.init)(jax.random.PRNGKey(0), x)
    outs = jax.jit(bb.apply)(variables, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
    # dcn offset conv exists in stage 2+ but not stage 1
    p = variables['params']
    assert 'conv_offset' in p['layer2_0']['conv2']
    assert 'conv_offset' not in p['layer1_0']
