"""Train state + the single pjit'd train step.

The reference's training-correctness-critical interplay (SURVEY.md §3.4:
warmup hook mutates lr/momentum -> AMP fwd/bwd with grad accumulation ->
optimizer step -> EMA fold; DDP all-reduces grads) collapses into ONE pure
jitted function over a data-sharded mesh:

- grads come out of ``jax.grad`` of a loss whose batch means are *global*
  means (the batch axis is sharded, XLA inserts the all-reduce over ICI);
- BN statistics are likewise global-batch statistics -> SyncBN for free;
- lr/momentum schedules are jnp functions of ``state.step``;
- EMA is a functional fold carried in the state.

No DDP wrapper, no hook ordering, no GradScaler — the whole per-iteration
pipeline is one XLA program.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp

from .ema import ema_momentum, ema_update
from .optim import SGDState, YoloSGDConfig, make_yolo_sgd


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    ema_params: Any
    ema_batch_stats: Any
    opt_state: SGDState


def create_train_state(model, rng, sample_img, opt_cfg: YoloSGDConfig):
    """Initialize params/BN stats/EMA copies/momentum buffers.

    Models whose train-only branches own parameters (grid head, mask
    head, ...) only create them in ``forward_train``, so initialization
    goes through it when present, synthesizing dummy gt args by
    parameter name."""
    if hasattr(model, 'forward_train'):
        import inspect
        b = sample_img.shape[0]
        g = 8
        dummies = {
            'gt_bboxes': jnp.tile(jnp.asarray([[0., 0., 32., 32.]]),
                                  (b, g, 1)).reshape(b, g, 4),
            'gt_labels': jnp.zeros((b, g), jnp.int32),
            'gt_valid': jnp.ones((b, g), bool),
            'gt_frame_masks': jnp.ones((b, g, 16, 16), jnp.float32),
            'gt_semantic_seg': jnp.zeros(
                (b, sample_img.shape[1] // 8, sample_img.shape[2] // 8),
                jnp.int32),
            'proposals': jnp.tile(jnp.asarray([[0., 0., 32., 32.]]),
                                  (b, 16, 1)).reshape(b, 16, 4),
            'prop_valid': jnp.ones((b, 16), bool),
        }
        sig = inspect.signature(model.forward_train)
        args = []
        ok = True
        for name, p in list(sig.parameters.items()):
            if name == 'img':
                args.append(sample_img)
            elif name in dummies:
                args.append(dummies[name])
            elif p.default is not inspect.Parameter.empty:
                break
            else:
                # Dispatch is by parameter NAME; a mis-named required arg
                # must fail loudly, not silently fall back to plain init
                # (which would skip train-only submodule creation).
                raise TypeError(
                    f"create_train_state: forward_train of "
                    f"{type(model).__name__} requires parameter '{name}' "
                    f"which has no synthesized dummy; known names: "
                    f"{sorted(dummies)} + 'img'. Rename the parameter or "
                    f"extend the dummies table.")
        if ok:
            variables = jax.jit(model.init, static_argnames=('method',))(
                rng, *args, method='forward_train')
            params = variables['params']
            batch_stats = variables.get('batch_stats', {})
            init_fn, _ = make_yolo_sgd(opt_cfg)
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                batch_stats=batch_stats,
                ema_params=jax.tree.map(jnp.copy, params),
                ema_batch_stats=jax.tree.map(jnp.copy, batch_stats),
                opt_state=init_fn(params))
    variables = jax.jit(model.init)(rng, sample_img)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    init_fn, _ = make_yolo_sgd(opt_cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        # real copies, not aliases: donated train-step buffers must be
        # distinct (f(donate(a), donate(a)) is rejected by the runtime)
        ema_params=jax.tree.map(jnp.copy, params),
        ema_batch_stats=jax.tree.map(jnp.copy, batch_stats),
        opt_state=init_fn(params))


def make_train_step(model,
                    opt_cfg: YoloSGDConfig,
                    ema_momentum_base: float = 0.9999,
                    ema_warm_up: int = 2000,
                    ema_interval: int = 1,
                    accumulation: int = 1,
                    loss_fn: Optional[Callable] = None):
    """Build the pure train step: (state, batch) -> (state, metrics).

    ``batch`` is a dict with ``img`` (B, H, W, 3) and padded gts
    (``gt_bboxes`` (B, G, 4), ``gt_labels`` (B, G), ``gt_valid`` (B, G)).

    ``accumulation > 1`` splits the leading batch dim into that many
    micro-batches scanned sequentially, SUMMING gradients between optimizer
    steps — the reference's semantics exactly (accum_optim_hooks.py:37-60:
    per-iter backward accumulates, no division). BN stats update per
    micro-batch, also like the reference. On TPU this trades HBM for a
    nominal batch larger than memory allows.

    Note on DP semantics: the reference averages positive-sample losses
    per-GPU then lets DDP average grads across GPUs; here masked means are
    over the *global* positive set — equivalent when positives are balanced
    and strictly better-behaved when they are not.
    """
    _, opt_update = make_yolo_sgd(opt_cfg)

    def default_loss(params, batch_stats, batch):
        pred_maps, mutated = model.apply(
            {'params': params, 'batch_stats': batch_stats},
            batch['img'], train=True, mutable=['batch_stats'])
        losses = model.loss(pred_maps, batch['gt_bboxes'],
                            batch['gt_labels'], batch['gt_valid'])
        total = sum(v for k, v in losses.items() if 'loss' in k)
        return total, (losses, mutated['batch_stats'])

    compute_loss = loss_fn or default_loss

    def train_step(state: TrainState, batch: Dict):
        grad_fn = jax.value_and_grad(compute_loss, has_aux=True)
        if accumulation > 1:
            micro = jax.tree.map(
                lambda x: x.reshape((accumulation, -1) + x.shape[1:]),
                batch)

            def scan_body(carry, mb):
                acc_grads, bstats = carry
                (tot, (losses, new_bs)), g = grad_fn(state.params, bstats,
                                                     mb)
                acc_grads = jax.tree.map(jnp.add, acc_grads, g)
                return (acc_grads, new_bs), (tot, losses)

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, new_batch_stats), (totals, loss_seq) = jax.lax.scan(
                scan_body, (zero_grads, state.batch_stats), micro)
            total = jnp.mean(totals)
            losses = jax.tree.map(jnp.mean, loss_seq)
        else:
            (total, (losses, new_batch_stats)), grads = grad_fn(
                state.params, state.batch_stats, batch)

        new_params, new_opt_state, opt_metrics = opt_update(
            grads, state.opt_state, state.params, state.step)

        m_t = ema_momentum(state.step, ema_momentum_base, ema_warm_up,
                           ema_interval)
        new_ema_params = ema_update(state.ema_params, new_params, m_t)
        new_ema_stats = ema_update(state.ema_batch_stats, new_batch_stats,
                                   m_t)

        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            ema_params=new_ema_params,
            ema_batch_stats=new_ema_stats,
            opt_state=new_opt_state)
        metrics = dict(loss=total, **losses, **opt_metrics)
        return new_state, metrics

    return train_step
