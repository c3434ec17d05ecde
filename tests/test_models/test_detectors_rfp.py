"""DetectoRS tests: SAC conv, rfp feedback hook, recursive FPN."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_backbone, build_neck


def test_sac_starts_near_plain_conv():
    from tpudet.models.backbones.detectors_resnet import SAConv2d
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 4).astype(
        np.float32))
    m = SAConv2d(features=6)
    vs = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vs, x)
    assert out.shape == (1, 8, 8, 6)
    # weight_diff starts at zero: both branches share the kernel, so the
    # switch blend is exact at init -> equals a plain dilation-1/3 blend of
    # the same kernel; check finiteness and gradient flow
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x)**2))(vs)
    assert all(np.isfinite(float(jnp.sum(jnp.abs(l))))
               for l in jax.tree.leaves(g))


def test_detectors_resnet_rfp_feedback_changes_output():
    bk = build_backbone(dict(type='DetectoRSResNet', depth=50,
                             output_img=True))
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3).astype(
        np.float32))
    vs = bk.init(jax.random.PRNGKey(0), x)
    outs = bk.apply(vs, x)
    assert len(outs) == 5  # img + 4 stages
    assert outs[0].shape == x.shape
    assert outs[-1].shape == (1, 2, 2, 2048)

    # feeding rfp feats through the zero-init rfp_conv is identity at init;
    # rfp_feats[i] matches stage i's OUTPUT resolution (stages 1..3)
    rfp_feats = [None] + [jnp.ones(o.shape[:3] + (256,)) for o in outs[2:]]
    outs2 = bk.apply(vs, x, rfp_feats)
    np.testing.assert_allclose(np.asarray(outs2[-1]),
                               np.asarray(outs[-1]), rtol=1e-5)


def test_rfp_neck_recursive_pass():
    rfp_backbone = dict(type='DetectoRSResNet', depth=50, rfp_inplanes=32)
    bk = build_backbone(dict(type='DetectoRSResNet', depth=50,
                             output_img=True))
    neck = build_neck(dict(
        type='RFP', in_channels=[256, 512, 1024, 2048], out_channels=32,
        num_outs=5, rfp_steps=2, aspp_out_channels=8,
        rfp_backbone=rfp_backbone))
    x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3).astype(
        np.float32))
    bvs = bk.init(jax.random.PRNGKey(0), x)
    feats = bk.apply(bvs, x)
    nvs = neck.init(jax.random.PRNGKey(1), feats)
    outs = neck.apply(nvs, feats)
    assert len(outs) == 5
    assert outs[0].shape == (1, 16, 16, 32)
    assert np.isfinite(np.asarray(outs[-1])).all()
    # the recursive module owns an independent backbone copy
    assert 'rfp_module0' in nvs['params']
