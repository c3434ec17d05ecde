"""Device mesh + sharding helpers (the entire "distributed stack").

The reference's distribution layer — NCCL process groups, DDP bucketed
all-reduce, DistOptimizerHook, SyncBN kernels, distributed samplers
gathering eval results (SURVEY.md §2.2) — dissolves on TPU into sharding
annotations: batch arrays are sharded over the ``data`` mesh axis, state is
replicated, and XLA schedules every collective over ICI (within slice) /
DCN (across slices).

Multi-host: call :func:`init_distributed` once per process
(reference analogue: mmcv ``init_dist``, tools/train.py:116-120), then the
same jitted step runs SPMD across all processes.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """jax.distributed.initialize wrapper; no-op in single-process runs."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(devices=None, axis_name: str = 'data') -> Mesh:
    """1-D data-parallel mesh over all (or given) devices.

    Detection is conv-shaped: there is no sequence axis and layer weights
    fit on one chip, so DP over ICI is the right (and the reference's only)
    parallelism. The axis is named so future spatial sharding can extend
    the mesh rather than replace it.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, axis_names=(axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh, axis_name: str = 'data') -> Dict:
    """Place a host batch dict with per-array batch-dim sharding.

    Leaves whose leading dim does not divide over the mesh (e.g. a PRNG
    key, scalars) are replicated instead.
    """
    n = mesh.devices.size
    data = data_sharding(mesh, axis_name)
    rep = replicated_sharding(mesh)

    def place(x):
        shardable = (getattr(x, 'ndim', 0) >= 1 and x.shape[0] > 0
                     and x.shape[0] % n == 0)
        return jax.device_put(x, data if shardable else rep)

    return jax.tree.map(place, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (train state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def jit_train_step(train_step, mesh: Mesh, axis_name: str = 'data',
                   donate_state: bool = True):
    """jit the (state, batch) -> (state, metrics) step. Input shardings
    follow the committed placements from :func:`replicate` /
    :func:`shard_batch` (replicated state, data-sharded batch); outputs are
    pinned replicated. Gradient/BN-stat all-reduces are compiler-inserted
    (no DDP object — SURVEY.md §2.2)."""
    rep = replicated_sharding(mesh)
    return jax.jit(
        train_step,
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else ())
