"""Optimizer: torch-semantics SGD with the reference's schedule stack.

Rebuilds, as pure jnp schedules inside one jitted update, what the
reference spreads across four mutable hooks:

- SGD w/ nesterov momentum + weight decay, bias/norm decay-exempt
  (reference configs/yolov4/yolov4l_coco_mosaic.py:109-115,
  ``paramwise_cfg=dict(bias_decay_mult=0., norm_decay_mult=0.)``);
- cosine LR to ``min_lr_ratio`` (:124-127);
- DetailedLinearWarmUpHook (mmdet/core/custom_hooks/warmup_hooks.py:41-59):
  over ``warmup_iters`` bias LR anneals 10x -> base, weight LR ramps
  0 -> base, momentum ramps 0.95x -> base;
- gradient clipping by global norm 35 (accum_optim_hooks.py:46-49).

Group labeling mirrors torch naming: '.weight' (conv kernels + BN scale)
follows the weight schedule; '.bias' (conv bias + BN bias) follows the bias
schedule; only conv kernels (ndim > 1) get weight decay.

There is no GradScaler equivalent: bf16 forward + fp32 master params makes
dynamic loss scaling unnecessary on TPU (the Fp16GradAccumulateOptimizerHook
AMP machinery, accum_optim_hooks.py:27-60, dissolves).
"""
from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class YoloSGDConfig(NamedTuple):
    lr: float = 0.01
    momentum: float = 0.937
    weight_decay: float = 5e-4
    nesterov: bool = True
    # 'sgd' (torch SGD semantics) or 'adam' (torch Adam, L2-into-grad decay;
    # the reference CornerNet/DETR configs train with Adam/AdamW)
    opt_type: str = 'sgd'
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    # schedule
    policy: str = 'cosine'  # 'cosine' | 'step' | 'fixed'
    total_steps: int = 100000
    min_lr_ratio: float = 0.2
    decay_steps: Tuple[int, ...] = ()  # iteration boundaries, 'step' policy
    gamma: float = 0.1
    warmup_iters: int = 10000
    lr_weight_warmup_ratio: float = 0.
    lr_bias_warmup_ratio: float = 10.
    momentum_warmup_ratio: float = 0.95
    grad_clip_norm: float = 35.0
    # cosine stepping granularity: per-epoch like mmcv by_epoch=True
    steps_per_epoch: int = 0  # 0 -> smooth per-iter cosine


def param_group_label(path: Tuple, leaf) -> str:
    """'weight' / 'bias' / 'weight_nodecay' per reference group semantics."""
    name = str(path[-1].key if hasattr(path[-1], 'key') else path[-1])
    if name == 'bias':
        return 'bias'
    if name == 'scale':  # BN gamma == torch '.weight' but norm_decay_mult=0
        return 'weight_nodecay'
    if getattr(leaf, 'ndim', 0) <= 1:
        return 'bias'
    return 'weight'


def cosine_lr(step, cfg: YoloSGDConfig):
    """Cosine annealing from lr to lr*min_lr_ratio over total_steps."""
    if cfg.steps_per_epoch > 0:
        progress = (step // cfg.steps_per_epoch) * cfg.steps_per_epoch
        progress = progress / max(cfg.total_steps, 1)
    else:
        progress = step / max(cfg.total_steps, 1)
    progress = jnp.clip(progress, 0.0, 1.0)
    min_lr = cfg.lr * cfg.min_lr_ratio
    return min_lr + (cfg.lr - min_lr) * 0.5 * (1 + jnp.cos(jnp.pi * progress))


def step_lr(step, cfg: YoloSGDConfig):
    """Step decay at iteration boundaries (mmcv StepLrUpdaterHook)."""
    n = sum(1 for _ in cfg.decay_steps)
    if n == 0:
        return jnp.asarray(cfg.lr)
    boundaries = jnp.asarray(cfg.decay_steps)
    k = jnp.sum(step >= boundaries)
    return cfg.lr * cfg.gamma**k


def schedule_lr(step, cfg: YoloSGDConfig):
    if cfg.policy == 'cosine':
        return cosine_lr(step, cfg)
    if cfg.policy == 'step':
        return step_lr(step, cfg)
    return jnp.asarray(cfg.lr)


def warmup_factors(step, cfg: YoloSGDConfig):
    """(weight_lr_scale, bias_lr_scale, momentum_scale) at ``step``.

    Inside warmup the reference overrides the LR hook using the *initial*
    base lr (warmup_hooks.py:33-59), so scales apply to cfg.lr, not the
    cosine value; we return multiplicative factors for each group plus the
    momentum value.
    """
    prog = jnp.clip(step / max(cfg.warmup_iters, 1), 0.0, 1.0)
    in_warmup = (step <= cfg.warmup_iters) & (cfg.warmup_iters > 0)
    w_scale = prog + (1 - prog) * cfg.lr_weight_warmup_ratio
    b_scale = prog + (1 - prog) * cfg.lr_bias_warmup_ratio
    m_scale = prog + (1 - prog) * cfg.momentum_warmup_ratio
    return in_warmup, w_scale, b_scale, m_scale


class SGDState(NamedTuple):
    momentum_buf: Any  # pytree like params


def global_norm_clip(grads, max_norm: float):
    """Clip by global L2 norm (torch clip_grad_norm_ semantics)."""
    gnorm = jnp.sqrt(
        sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
            for g in jax.tree.leaves(grads)))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), gnorm


def make_yolo_sgd(cfg: YoloSGDConfig):
    """Returns (init_fn(params) -> SGDState,
    update_fn(grads, state, params, step) -> (new_params, new_state, metrics)).

    Torch SGD update order (torch/optim/sgd.py semantics the reference
    relies on): d = g + wd*p; buf = m*buf + d; d = d + m*buf if nesterov;
    p -= lr*d.
    """

    def init_fn(params) -> SGDState:
        if cfg.opt_type == 'adam':
            # leaf = stacked (m, v)
            return SGDState(jax.tree.map(
                lambda p: jnp.zeros((2,) + p.shape, jnp.float32), params))
        return SGDState(jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads, state: SGDState, params, step):
        labels = jax.tree_util.tree_map_with_path(param_group_label, params)

        base_lr = schedule_lr(step, cfg)
        in_warmup, w_scale, b_scale, m_scale = warmup_factors(step, cfg)
        lr_weight = jnp.where(in_warmup, cfg.lr * w_scale, base_lr)
        lr_bias = jnp.where(in_warmup, cfg.lr * b_scale, base_lr)
        momentum = jnp.where(in_warmup, cfg.momentum * m_scale, cfg.momentum)

        grads, gnorm = global_norm_clip(grads, cfg.grad_clip_norm)

        t = (step + 1).astype(jnp.float32) if hasattr(step, 'astype') \
            else float(step + 1)

        def step_leaf(label, g, buf, p):
            g = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            if label == 'weight':
                g = g + cfg.weight_decay * p32
                lr = lr_weight
            elif label == 'weight_nodecay':
                lr = lr_weight
            else:
                lr = lr_bias
            if cfg.opt_type == 'adam':
                m = cfg.adam_b1 * buf[0] + (1 - cfg.adam_b1) * g
                v = cfg.adam_b2 * buf[1] + (1 - cfg.adam_b2) * g * g
                mhat = m / (1 - cfg.adam_b1**t)
                vhat = v / (1 - cfg.adam_b2**t)
                upd = mhat / (jnp.sqrt(vhat) + cfg.adam_eps)
                return (p32 - lr * upd).astype(p.dtype), jnp.stack([m, v])
            buf = momentum * buf + g
            if cfg.nesterov:
                g = g + momentum * buf
            else:
                g = buf
            return (p32 - lr * g).astype(p.dtype), buf

        out = jax.tree.map(step_leaf, labels, grads, state.momentum_buf,
                           params)
        new_params = jax.tree.map(lambda x: x[0], out,
                                  is_leaf=lambda x: isinstance(x, tuple))
        new_buf = jax.tree.map(lambda x: x[1], out,
                               is_leaf=lambda x: isinstance(x, tuple))
        metrics = dict(grad_norm=gnorm, lr=lr_weight, momentum=momentum)
        return new_params, SGDState(new_buf), metrics

    return init_fn, update_fn
