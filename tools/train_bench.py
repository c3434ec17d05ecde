#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Training-step throughput benchmark (synthetic batch): measures the
full pjit'd train step (fwd + bwd + SGD + EMA) images/sec on the current
device(s). Two-point timing cancels dispatch constants."""
import argparse
import json
import time

import numpy as np


def _maybe_reexec_with_remote_compile():
    """Same as bench.py: XLA:TPU compiles of this model take 10+ minutes
    on this 1-core host but seconds via the terminal-side compile service;
    the flag is read at interpreter start, so re-exec once with it set."""
    import os
    import sys
    if os.environ.get('PALLAS_AXON_REMOTE_COMPILE') != '1' and \
            os.environ.get('TPUDET_NO_REEXEC') != '1':
        os.environ['PALLAS_AXON_REMOTE_COMPILE'] = '1'
        os.environ['TPUDET_NO_REEXEC'] = '1'
        os.execve(sys.executable, [sys.executable] + sys.argv, os.environ)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--scale', default='l', choices=['s', 'l'])
    p.add_argument('--batch', type=int, default=16)
    p.add_argument('--img-size', type=int, default=640)
    p.add_argument('--max-gts', type=int, default=64)
    p.add_argument('--dtype', default='bfloat16',
                   choices=['bfloat16', 'float32'])
    p.add_argument('--donate', action='store_true',
                   help='donate the train state into the jitted step '
                        '(production default; measured SLOWER on the '
                        'remote-PJRT tunnel backend, so off here)')
    p.add_argument('--device-aug', action='store_true',
                   help='include the fused on-device mosaic/affine/HSV '
                        'augmentation in the step (uint8 tiles in)')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model
    from tpudet.parallel.mesh import (jit_train_step, make_mesh, replicate,
                                      shard_batch)
    from tpudet.train.optim import YoloSGDConfig
    from tpudet.train.train_state import create_train_state, make_train_step

    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    model = _flagship_model(dtype=dtype, scale=args.scale)
    opt_cfg = YoloSGDConfig(total_steps=10000, warmup_iters=100)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, args.img_size, args.img_size, 3)), opt_cfg)
    mesh = make_mesh()

    rng = np.random.RandomState(0)
    g = args.max_gts
    b = args.batch
    s = args.img_size
    loss_fn = None
    if args.device_aug:
        from tpudet.data.device_aug import device_mosaic_affine
        g4 = max(g // 4, 1)
        xy = rng.rand(b, 4, g4, 2).astype(np.float32) * s * 0.6
        wh = rng.rand(b, 4, g4, 2).astype(np.float32) * 120 + 8
        batch = dict(
            tiles=(rng.rand(b, 4, s, s, 3) * 255).astype(np.uint8),
            tile_hw=np.full((b, 4, 2), s, np.int32),
            gt_bboxes=np.concatenate([xy, np.minimum(xy + wh, s)], -1),
            gt_labels=rng.randint(0, 80, (b, 4, g4)).astype(np.int32),
            gt_valid=rng.rand(b, 4, g4) < 0.5,
            aug_seed=np.arange(b, dtype=np.int32),
        )

        def loss_fn(params, batch_stats, mb):
            aug = device_mosaic_affine(
                mb['tiles'], mb['tile_hw'], mb['gt_bboxes'],
                mb['gt_valid'], mb['gt_labels'], mb['aug_seed'],
                out_size=s)
            pred_maps, mutated = model.apply(
                {'params': params, 'batch_stats': batch_stats},
                aug['img'], train=True, mutable=['batch_stats'])
            losses = model.loss(pred_maps, aug['gt_bboxes'],
                                aug['gt_labels'], aug['gt_valid'])
            total = sum(v for k, v in losses.items() if 'loss' in k)
            return total, (losses, mutated['batch_stats'])
    else:
        xy = rng.rand(b, g, 2).astype(np.float32) * s * 0.7
        wh = rng.rand(b, g, 2).astype(np.float32) * 150 + 8
        batch = dict(
            img=rng.rand(b, s, s, 3).astype(np.float32),
            gt_bboxes=np.concatenate([xy, np.minimum(xy + wh, s)], -1),
            gt_labels=rng.randint(0, 80, (b, g)).astype(np.int32),
            gt_valid=rng.rand(b, g) < 0.5,
        )
    step_fn = jit_train_step(
        make_train_step(model, opt_cfg, loss_fn=loss_fn), mesh,
        donate_state=args.donate)
    state = replicate(state, mesh)
    batch = shard_batch(batch, mesh)

    # XLA's own FLOP count for the WHOLE train step (fwd+bwd+SGD+EMA),
    # for the MFU report; peak per device kind (bf16 matmul). Lowering
    # the same jitted step_fn reuses the one compilation below.
    step_flops = None
    try:
        compiled = step_fn.lower(state, batch).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        step_flops = float(ca['flops'])
    except Exception as e:
        print(f'cost_analysis unavailable: {e}', file=_sys.stderr)
    PEAK_BF16 = {  # TFLOP/s per chip
        'TPU v5 lite': 197.0, 'TPU v5e': 197.0, 'TPU v4': 275.0,
        'TPU v5p': 459.0, 'TPU v6 lite': 918.0,
    }
    kind = jax.devices()[0].device_kind
    peak_tflops = PEAK_BF16.get(kind)

    state, metrics = step_fn(state, batch)
    float(metrics['loss'])  # fetch: the only reliable sync on this backend

    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = step_fn(state, batch)
        float(m['loss'])  # host fetch forces completion of the chain
        return time.perf_counter() - t0

    m_iters = 5
    t1 = run(m_iters)
    t2 = run(2 * m_iters)
    dt = max(t2 - t1, 1e-9)
    img_s = b * m_iters / dt
    result = dict(
        metric=f'yolov4{args.scale}-{args.img_size} train step' + (' +device-aug' if args.device_aug else ''),
        img_per_sec=round(img_s, 1),
        ms_per_step=round(dt / m_iters * 1e3, 1),
        batch=b, dtype=args.dtype,
        device=jax.devices()[0].device_kind,
        loss=float(metrics['loss']))
    if step_flops is not None:
        result['step_tflop'] = round(step_flops / 1e12, 3)
        achieved = step_flops * (m_iters / dt) / 1e12
        result['achieved_tflops'] = round(achieved, 1)
        if peak_tflops:
            result['mfu'] = round(achieved / peak_tflops, 4)
            result['peak_tflops_bf16'] = peak_tflops
    print(json.dumps(result))


if __name__ == '__main__':
    _maybe_reexec_with_remote_compile()
    main()
