"""Functional EMA over the full train state (params + BN stats).

Rebuilds StateEMAHook (mmdet/core/custom_hooks/ema_hooks.py:8-126)
functionally: instead of registering ``ema_*`` buffers on a mutable module
and swapping tensors around eval, the train state simply carries
``(params, batch_stats, ema_params, ema_batch_stats)``; eval reads the EMA
copies directly — the swap trick (:97-126) dissolves.

Semantics preserved exactly:
- ``ema = m_t * ema + (1 - m_t) * online`` with warmup momentum
  ``m_t = momentum * (1 - exp(-iter / (warm_up * interval)))`` (:88-89);
- non-float leaves are copied verbatim (:94-95);
- update every ``interval`` iterations, where interval derives from
  ``nominal_batch_size / actual_batch`` (:40-46, config yolov4l:141-146).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp


def ema_momentum(step, momentum: float = 0.9999, warm_up: int = 2000,
                 interval: int = 1):
    """Warmup-scaled EMA momentum at ``step`` (0-based iter)."""
    return momentum * (1 - jnp.exp(-step / (warm_up * interval)))


def ema_update(ema_tree: Any, online_tree: Any, momentum_t) -> Any:
    """One EMA fold; float leaves blended, others copied."""

    def blend(e, o):
        if jnp.issubdtype(e.dtype, jnp.floating):
            return (momentum_t * e.astype(jnp.float32) +
                    (1 - momentum_t) * o.astype(jnp.float32)).astype(e.dtype)
        return o

    return jax.tree.map(blend, ema_tree, online_tree)


def ema_interval(nominal_batch_size, samples_per_step):
    """interval = ceil(nominal / actual global batch) (ema_hooks.py:105-110
    analogue)."""
    if nominal_batch_size is None:
        return 1
    return max(1, math.ceil(nominal_batch_size / samples_per_step))
