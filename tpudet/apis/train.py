"""Training driver (reference mmdet/apis/train.py:37 analogue).

Replaces the mmcv Runner + prioritized-hook machinery with a plain loop
around ONE jitted train step; everything the reference attaches as hooks
(cosine LR, detailed warmup, grad clip, EMA, checkpointing, eval) is
either inside the step (schedules/EMA) or an explicit call here
(checkpoint/eval). Resume is restart-idempotent like the reference's
hard-coded ``resume_from=latest`` pattern (SURVEY.md §5).
"""
from __future__ import annotations

import os
import os.path as osp
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.dataset import build_dataset
from ..data.loader import DetDataLoader
from ..evaluation.mean_ap import coco_fast_bbox_eval
from ..models.builder import build_detector
from ..parallel.mesh import jit_train_step, make_mesh, replicate, shard_batch
from ..train.optim import YoloSGDConfig
from ..train.train_state import create_train_state, make_train_step
from ..utils.checkpoint import (latest_step, load_train_state,
                                save_train_state, save_variables)
from ..utils.logging import get_root_logger
from .test import single_device_test


def opt_config_from_cfg(cfg: Config, total_steps: int,
                        steps_per_epoch: int,
                        accumulation: int = 1) -> YoloSGDConfig:
    opt = cfg.get('optimizer', {})
    lr_cfg = cfg.get('lr_config', {})
    warm = {}
    for hook in cfg.get('custom_hooks', []):
        if hook.get('type') == 'DetailedLinearWarmUpHook':
            warm = hook
    clip = cfg.get('optimizer_config', {}).get('grad_clip', {}) or {}
    policy = lr_cfg.get('policy', 'CosineAnnealing').lower()
    policy = {'cosineannealing': 'cosine', 'step': 'step',
              'fixed': 'fixed'}.get(policy, 'cosine')
    decay_epochs = lr_cfg.get('step', ())
    opt_type = str(opt.get('type', 'SGD')).lower()
    return YoloSGDConfig(
        lr=opt.get('lr', 0.01),
        momentum=opt.get('momentum', 0.937),
        weight_decay=opt.get('weight_decay',
                             0.0 if opt_type == 'adam' else 5e-4),
        nesterov=opt.get('nesterov', True),
        opt_type='adam' if opt_type in ('adam', 'adamw') else 'sgd',
        policy=policy,
        decay_steps=tuple(e * steps_per_epoch for e in decay_epochs),
        gamma=lr_cfg.get('gamma', 0.1),
        total_steps=total_steps,
        min_lr_ratio=lr_cfg.get('min_lr_ratio', 0.2),
        # config warmup_iters counts data iterations; our step counts
        # optimizer steps (one per `accumulation` data iterations)
        warmup_iters=max(1, warm.get('warmup_iters', 10000) // accumulation),
        lr_weight_warmup_ratio=warm.get('lr_weight_warmup_ratio', 0.),
        lr_bias_warmup_ratio=warm.get('lr_bias_warmup_ratio', 10.),
        momentum_warmup_ratio=warm.get('momentum_warmup_ratio', 0.95),
        grad_clip_norm=clip.get('max_norm', 35.0),
        steps_per_epoch=steps_per_epoch)


def train_detector(cfg: Config,
                   work_dir: str,
                   max_steps: Optional[int] = None,
                   resume: bool = True,
                   eval_interval: Optional[int] = None) -> Dict:
    """Config-driven training. Returns final metrics dict."""
    os.makedirs(work_dir, exist_ok=True)  # every host logs locally
    logger = get_root_logger(osp.join(work_dir, 'train.log'))

    dataset = build_dataset(cfg['data']['train'])
    if len(dataset) == 0:
        raise ValueError(
            'training dataset is empty after filtering — check ann_file '
            'paths and that the dataset `classes` match the annotation '
            'category names (unknown categories are silently dropped)')
    n_dev = jax.device_count()
    per_dev = cfg['data'].get('samples_per_gpu', 8)
    global_batch = per_dev * n_dev
    max_epochs = cfg.get('runner', {}).get('max_epochs', 300)

    # gradient accumulation toward the nominal batch size
    # (reference accum_optim_hooks.py:27-35); one train_step == one
    # optimizer step over `accumulation` scanned micro-batches
    nominal = cfg.get('nominal_batch_size', global_batch)
    accumulation = max(1, -(-nominal // global_batch))

    # In a REAL multi-process run each process loads only its slice of
    # the global batch (assembled by parallel/mesh.py::shard_batch via
    # make_array_from_process_local_data). Derived from device
    # attributes, not jax.process_count(), so the monkeypatched
    # single-process multihost simulations keep whole-batch loading.
    n_proc_real = len({d.process_index for d in jax.devices()})
    loader_batch = global_batch * accumulation // n_proc_real

    device_aug = cfg['data'].get('device_aug')  # dict -> on-device mosaic
    if device_aug is not None:
        from ..data.loader import MosaicTileLoader
        loader = MosaicTileLoader(
            dataset, batch_size=loader_batch,
            tile_size=cfg['data'].get('train_img_size', 640),
            max_gts_per_tile=cfg['data'].get('max_gts', 120) // 4,
            num_workers=cfg['data'].get('workers_per_gpu', 2),
            process_index=jax.process_index(),
            process_count=jax.process_count())
    else:
        loader = DetDataLoader(
            dataset, batch_size=loader_batch,
            max_gts=cfg['data'].get('max_gts', 120),
            img_size=cfg['data'].get('train_img_size', 640),
            num_workers=cfg['data'].get('workers_per_gpu', 2),
            process_index=jax.process_index(),
            process_count=jax.process_count())
    steps_per_epoch = len(loader)
    if steps_per_epoch == 0:
        # fail loudly: a silently-empty loader (dataset smaller than the
        # global batch, or classes filtering every annotation away) would
        # otherwise spin the epoch loop doing eval-only passes forever
        raise ValueError(
            f'training loader yields 0 steps/epoch: dataset has '
            f'{len(dataset)} samples but the global batch is '
            f'{global_batch * accumulation} (samples_per_gpu x devices x '
            f'accumulation). Shrink the batch/accumulation or check that '
            f'`classes` matches the annotation categories.')
    total_steps = steps_per_epoch * max_epochs
    if max_steps is not None:
        total_steps = min(total_steps, max_steps)
    logger.info(
        f'devices {n_dev} global / {jax.local_device_count()} local, '
        f'process {jax.process_index()}/{jax.process_count()}, '
        f'global batch {global_batch} x accumulation {accumulation}')

    model_cfg = dict(cfg['model'])
    if cfg.get('compute_dtype') == 'bfloat16':
        # bf16 forward with fp32 master params/loss — the TPU replacement
        # for the reference's AMP/GradScaler config (fp16 = dict(...))
        for part in ('backbone', 'neck', 'bbox_head'):
            if model_cfg.get(part) is not None:
                model_cfg[part] = {**model_cfg[part],
                                   'dtype': jnp.bfloat16}
    model = build_detector(model_cfg)
    opt_cfg = opt_config_from_cfg(cfg, total_steps, steps_per_epoch,
                                  accumulation)

    ema_cfg = {}
    for hook in cfg.get('custom_hooks', []):
        if hook.get('type') == 'StateEMAHook':
            ema_cfg = hook

    img_size = cfg['data'].get('train_img_size', 640)
    state = create_train_state(model, jax.random.PRNGKey(cfg.get('seed', 0)),
                               jnp.zeros((1, img_size, img_size, 3)), opt_cfg)
    mesh = make_mesh()
    # EMA fires once per optimizer step; with `step` counting optimizer
    # steps the reference's warmup curve m(iter) = m*(1-exp(-iter/(w*intv)))
    # reduces to interval 1 (iter = step * accumulation).
    loss_fn = None
    if hasattr(model, 'forward_train'):
        # any detector whose training runs inside the module (two-stage
        # families, SparseRCNN, YOLACT, KD, ...): build the arg list from
        # the forward_train signature by name
        import inspect
        ft_sig = inspect.signature(model.forward_train)

        def loss_fn(params, batch_stats, batch):  # noqa: F811
            args = []
            for name, p in ft_sig.parameters.items():
                if name == 'img':
                    args.append(batch['img'])
                elif name in batch:
                    args.append(batch[name])
                elif p.default is not inspect.Parameter.empty:
                    break  # optional tail args (e.g. gt_semantic_seg)
                else:
                    # name-based dispatch must not silently truncate the
                    # arg list when a REQUIRED parameter is missing from
                    # the batch (this bit once: LD teacher never built)
                    raise TypeError(
                        f"forward_train of {type(model).__name__} requires "
                        f"parameter '{name}' but the batch only provides "
                        f"{sorted(batch)}")
            losses, mutated = model.apply(
                {'params': params, 'batch_stats': batch_stats},
                *args, method='forward_train', mutable=['batch_stats'])
            total = sum(v for k, v in losses.items() if 'loss' in k)
            return total, (losses, mutated['batch_stats'])
    elif device_aug is not None:
        from ..data.device_aug import device_mosaic_affine
        aug_kwargs = {k: v for k, v in dict(device_aug).items()}
        aug_kwargs.setdefault('out_size',
                              cfg['data'].get('train_img_size', 640))

        def loss_fn(params, batch_stats, batch):
            aug = device_mosaic_affine(
                batch['tiles'], batch['tile_hw'], batch['gt_bboxes'],
                batch['gt_valid'], batch['gt_labels'], batch['aug_seed'],
                **aug_kwargs)
            pred_maps, mutated = model.apply(
                {'params': params, 'batch_stats': batch_stats},
                aug['img'], train=True, mutable=['batch_stats'])
            losses = model.loss(pred_maps, aug['gt_bboxes'],
                                aug['gt_labels'], aug['gt_valid'])
            total = sum(v for k, v in losses.items()
                        if 'loss' in k)
            return total, (losses, mutated['batch_stats'])

    train_step = make_train_step(
        model, opt_cfg,
        ema_momentum_base=ema_cfg.get('momentum', 0.9999),
        ema_warm_up=ema_cfg.get('warm_up', 2000),
        ema_interval=1,
        accumulation=accumulation,
        loss_fn=loss_fn)
    step_fn = jit_train_step(train_step, mesh)

    ckpt_dir = osp.join(work_dir, 'ckpts')
    start_step = 0
    if resume:
        last = latest_step(ckpt_dir)
        if last is not None:
            state = load_train_state(
                ckpt_dir, jax.tree.map(ocp_abstract, state), last)
            start_step = last
            logger.info(f'resumed from step {last}')

    state = replicate(state, mesh)
    ckpt_interval_epochs = cfg.get('checkpoint_config', {}).get('interval', 5)
    eval_interval = eval_interval if eval_interval is not None else cfg.get(
        'evaluation', {}).get('interval', 1)
    log_interval = cfg.get('log_config', {}).get('interval', 50)

    # NaN guard (SURVEY §5: the TPU-side jax_debug_nans analogue): check
    # loss/grad finiteness every `interval` steps; dump diagnostics and
    # abort instead of silently training on poisoned gradients.
    nan_guard = cfg.get('nan_guard', dict(enabled=True, interval=50))
    nan_interval = max(int(nan_guard.get('interval', 50)), 1) \
        if nan_guard.get('enabled', True) else 0

    metrics = {}
    step = start_step
    best_map = -1.0
    t0 = time.time()
    for epoch in range(start_step // max(steps_per_epoch, 1), max_epochs):
        loader.set_epoch(epoch)
        for batch in loader:
            batch.pop('img_metas', None)
            batch.pop('scale_factor', None)
            state, metrics = step_fn(state, shard_batch(batch, mesh))
            step += 1
            if nan_interval and step % nan_interval == 0:
                loss_v = float(metrics.get('loss', 0.0))
                gnorm_v = float(metrics.get('grad_norm', 0.0))
                if not (np.isfinite(loss_v) and np.isfinite(gnorm_v)):
                    bad = {k: float(v) for k, v in metrics.items()}
                    logger.error(
                        f'NaN guard tripped at step {step}: '
                        + ' '.join(f'{k}={v}' for k, v in bad.items()))
                    save_train_state(osp.join(work_dir, 'nan_dump'),
                                     jax.device_get(state), step)
                    raise FloatingPointError(
                        f'non-finite training metrics at step {step} '
                        f'(loss={loss_v}, grad_norm={gnorm_v}); state '
                        f'dumped to {work_dir}/nan_dump')
            if step % log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                rate = (log_interval * global_batch * accumulation /
                        (time.time() - t0))
                t0 = time.time()
                parts = ' '.join(
                    f'{k[5:] if k.startswith("loss_") else k} {v:.4f}'
                    for k, v in sorted(m.items())
                    if 'loss' in k and k != 'loss')
                logger.info(
                    f'epoch {epoch} step {step}/{total_steps} '
                    f'loss {m["loss"]:.4f} ({parts}) '
                    f'lr {m["lr"]:.5f} gnorm {m["grad_norm"]:.2f} '
                    f'img/s {rate:.1f}')
            if max_steps is not None and step >= max_steps:
                break
        if jax.process_index() == 0 and \
                (epoch + 1) % ckpt_interval_epochs == 0:
            save_train_state(ckpt_dir, jax.device_get(state), step)
        if eval_interval and (epoch + 1) % eval_interval == 0 and \
                'val' in cfg.get('data', {}):
            report = evaluate_ema(cfg, model, state, logger)
            # best-checkpoint tracking (reference eval_hooks.py:160)
            cur = report.get('map', float('nan'))
            if jax.process_index() == 0 and np.isfinite(cur) and \
                    cur > best_map:
                best_map = cur
                save_variables(
                    osp.join(work_dir, 'best_ema.msgpack'),
                    {'params': jax.device_get(state.ema_params),
                     'batch_stats': jax.device_get(state.ema_batch_stats)},
                    meta=dict(step=step, map=cur,
                              CLASSES=list(dataset.CLASSES)))
                logger.info(f'new best map {cur:.4f} at step {step}')
        if max_steps is not None and step >= max_steps:
            break

    # every process logs a checksum over its (replicated) final params:
    # in a multi-process run equal checksums across the per-process logs
    # prove the SPMD state stayed consistent (a desynced process would
    # have trained on its own shard only and diverged)
    checksum = float(sum(
        np.abs(np.asarray(jax.device_get(x), np.float64)).sum()
        for x in jax.tree.leaves(state.params)))
    logger.info(f'final param checksum {checksum:.9e} at step {step}')
    if jax.process_index() == 0:
        # publish EMA weights for inference (reference: EMA swap before
        # CheckpointHook, ema_hooks.py:97-126)
        save_variables(
            osp.join(work_dir, 'latest_ema.msgpack'),
            {'params': jax.device_get(state.ema_params),
             'batch_stats': jax.device_get(state.ema_batch_stats)},
            meta=dict(step=step, CLASSES=list(dataset.CLASSES)))
    return {k: float(v) for k, v in metrics.items()}


def ocp_abstract(x):
    return jax.ShapeDtypeStruct(np.shape(x), x.dtype)


def evaluate_ema(cfg, model, state, logger):
    """Eval with EMA weights (the reference's swap trick, dissolved)."""
    val_dataset = build_dataset({**cfg['data']['val'], 'test_mode': True})
    variables = {'params': state.ema_params,
                 'batch_stats': state.ema_batch_stats}
    results = single_device_test(
        model, variables, val_dataset,
        batch_size=cfg['data'].get('samples_per_gpu', 8))
    annotations = [
        val_dataset.get_ann_info_test(i) for i in range(len(val_dataset))
    ]
    report = coco_fast_bbox_eval(results, annotations,
                                 classes=val_dataset.CLASSES)
    logger.info('eval: ' + ' '.join(f'{k}={v:.4f}' for k, v in report.items()))
    return report
