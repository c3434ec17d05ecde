"""Train-step + multi-device sharding tests — run for real on the 8-device
virtual CPU mesh (the capability the reference only mocks, SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.builder import build_detector
from tpudet.parallel.mesh import (jit_train_step, make_mesh, replicate,
                                  shard_batch)
from tpudet.train.optim import YoloSGDConfig
from tpudet.train.train_state import create_train_state, make_train_step


def tiny_cfg(num_classes=4):
    return dict(
        type='SingleStageDetector',
        backbone=dict(type='DarknetCSP', scale='v4s5p', out_indices=[3, 4, 5]),
        neck=dict(type='YOLOV4Neck', in_channels=[128, 256, 256],
                  out_channels=[64, 64, 64], csp_repetition=1),
        bbox_head=dict(type='YOLOCSPHead', num_classes=num_classes,
                       in_channels=[64, 64, 64]),
        test_cfg=dict(score_thr=0.001, nms=dict(iou_threshold=0.65),
                      max_per_img=10, nms_pre=128))


def tiny_batch(batch_size=8, size=64, g_max=3, num_classes=4, seed=0):
    rng = np.random.RandomState(seed)
    gt = np.zeros((batch_size, g_max, 4), np.float32)
    valid = np.zeros((batch_size, g_max), bool)
    for i in range(batch_size):
        n = rng.randint(0, g_max + 1)
        xy = rng.rand(n, 2) * size * 0.5
        wh = rng.rand(n, 2) * size * 0.4 + 6
        gt[i, :n] = np.concatenate([xy, np.minimum(xy + wh, size)], -1)
        valid[i, :n] = True
    return {
        'img': rng.rand(batch_size, size, size, 3).astype(np.float32),
        'gt_bboxes': gt,
        'gt_labels': rng.randint(0, num_classes,
                                 (batch_size, g_max)).astype(np.int32),
        'gt_valid': valid,
    }


def test_train_step_runs_and_decreases_loss():
    model = build_detector(tiny_cfg())
    opt_cfg = YoloSGDConfig(lr=0.01, total_steps=50, warmup_iters=0,
                            steps_per_epoch=0)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), opt_cfg)
    step = jax.jit(make_train_step(model, opt_cfg))
    batch = tiny_batch()

    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics['loss']))
    assert np.isfinite(losses).all()
    # overfit a fixed batch: loss must drop
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    # EMA has moved off init but stays close early (tiny warmup momentum)
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        state.params, state.ema_params)
    assert max(jax.tree.leaves(diff)) > 0


def test_train_step_multidevice_matches_single_device():
    """The same step over an 8-device mesh must produce (near-)identical
    params as single-device: global-batch means + compiler collectives."""
    assert len(jax.devices()) >= 8
    model = build_detector(tiny_cfg())
    opt_cfg = YoloSGDConfig(lr=0.01, total_steps=50, warmup_iters=0)
    state0 = create_train_state(model, jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)), opt_cfg)
    train_step = make_train_step(model, opt_cfg)
    batch = tiny_batch(batch_size=8)

    # single device
    s1, m1 = jax.jit(train_step)(state0, batch)

    # 8-device mesh
    mesh = make_mesh(jax.devices()[:8])
    step8 = jit_train_step(train_step, mesh, donate_state=False)
    s8, m8 = step8(replicate(state0, mesh), shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m1['loss']), float(m8['loss']),
                               rtol=1e-4)
    k1 = jax.tree.leaves(s1.params)[0]
    k8 = jax.tree.leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k8), atol=1e-5)
    # BN stats are global-batch stats on both paths (SyncBN-for-free)
    b1 = jax.tree.leaves(s1.batch_stats)[0]
    b8 = jax.tree.leaves(s8.batch_stats)[0]
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b8), atol=1e-5)


def test_grad_accumulation_sums_micro_grads():
    """accumulation=2 must equal one optimizer step on summed micro-batch
    grads (reference accum_optim_hooks semantics: backward accumulates,
    no division)."""
    model = build_detector(tiny_cfg())
    opt_cfg = YoloSGDConfig(lr=0.01, total_steps=50, warmup_iters=0)
    state0 = create_train_state(model, jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)), opt_cfg)
    batch = tiny_batch(batch_size=4)

    # manual: grads of each half with sequential BN-stats threading
    def loss_fn(params, bstats, mb):
        pred, mut = model.apply({'params': params, 'batch_stats': bstats},
                                mb['img'], train=True,
                                mutable=['batch_stats'])
        losses = model.loss(pred, mb['gt_bboxes'], mb['gt_labels'],
                            mb['gt_valid'])
        total = sum(v for k, v in losses.items() if k.startswith('loss'))
        return total, mut['batch_stats']

    half = {k: v[:2] for k, v in batch.items()}
    half2 = {k: v[2:] for k, v in batch.items()}
    g1, bs1 = jax.grad(loss_fn, has_aux=True)(state0.params,
                                              state0.batch_stats, half)
    g2, _ = jax.grad(loss_fn, has_aux=True)(state0.params, bs1, half2)
    summed = jax.tree.map(jnp.add, g1, g2)

    step2 = jax.jit(make_train_step(model, opt_cfg, accumulation=2))
    s_acc, m_acc = step2(state0, batch)

    # reproduce the update with the summed grads
    from tpudet.train.optim import make_yolo_sgd
    _, update = make_yolo_sgd(opt_cfg)
    want_params, _, _ = update(summed, state0.opt_state, state0.params,
                               jnp.asarray(0))
    got = jax.tree.leaves(s_acc.params)[0]
    want = jax.tree.leaves(want_params)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    assert np.isfinite(float(m_acc['loss']))


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_misnamed_forward_train_arg_fails_loudly():
    """Name-based signature dispatch must raise (naming the key) when a
    required forward_train parameter has no dummy/batch binding — a silent
    arg-list truncation here once left the LD teacher never built."""
    import flax.linen as nn
    import pytest

    class BadModel(nn.Module):
        @nn.compact
        def __call__(self, img):
            return nn.Dense(4)(img)

        def forward_train(self, img, gt_boxen):  # deliberately mis-named
            return {'loss': jnp.sum(nn.Dense(4)(img))}

    opt_cfg = YoloSGDConfig(lr=0.01, total_steps=10, warmup_iters=0,
                            steps_per_epoch=0)
    with pytest.raises(TypeError, match='gt_boxen'):
        create_train_state(BadModel(), jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 3)), opt_cfg)
