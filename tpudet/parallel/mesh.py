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
    """jax.distributed.initialize wrapper; no-op in single-process runs.

    ``TPUDET_PLATFORM`` (e.g. ``cpu``) pins the jax platform before any
    backend is created — needed because some environments force a
    platform at interpreter start (config-level, so a plain
    ``JAX_PLATFORMS`` env var cannot override it in a subprocess); the
    multi-process CPU launch test relies on this.
    """
    import os
    platform = os.environ.get('TPUDET_PLATFORM')
    if platform:
        jax.config.update('jax_platforms', platform)
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


def mesh_process_count(mesh: Mesh) -> int:
    """Number of distinct OS processes owning the mesh's devices.

    Derived from device attributes (not ``jax.process_count()``) so the
    single-process loader/checkpoint simulations that monkeypatch the
    process API still exercise the single-process placement path."""
    return len({d.process_index for d in mesh.devices.flat})


def shard_batch(batch: Dict, mesh: Mesh, axis_name: str = 'data') -> Dict:
    """Place a host batch dict with per-array batch-dim sharding.

    Single-process: the host batch is the global batch; ``device_put``
    splits it across the mesh. Multi-process: each process's loader
    yields its process-local slice (1/Nth of the global batch, disjoint
    by construction — data/loader.py rank-strided shards), and the
    global array is assembled with
    ``jax.make_array_from_process_local_data`` — the TPU-native
    equivalent of the reference's DistributedGroupSampler feeding
    per-rank DDP replicas (SURVEY.md §2.2).

    Leaves whose leading dim does not divide over the mesh (e.g. a PRNG
    key, scalars) are replicated instead (multi-process replication
    asserts value equality across processes — a loud failure beats
    silent divergence).
    """
    n = mesh.devices.size
    n_proc = mesh_process_count(mesh)
    data = data_sharding(mesh, axis_name)
    rep = replicated_sharding(mesh)

    def place(x):
        global_rows = getattr(x, 'shape', (0,))[0] * n_proc \
            if getattr(x, 'ndim', 0) >= 1 else 0
        shardable = global_rows > 0 and global_rows % n == 0
        if not shardable:
            return jax.device_put(x, rep)
        if n_proc == 1:
            return jax.device_put(x, data)
        return jax.make_array_from_process_local_data(data, np.asarray(x))

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
