"""Checkpoint I/O.

Inference weights: flax msgpack files (small, dependency-light), with a
meta dict carrying CLASSES + step like the reference checkpoint meta
(consumed at mmdet/apis/inference.py:43-49).

Train state: orbax (async-capable, multi-host-safe) — the analogue of
mmcv CheckpointHook + ``resume_from`` (SURVEY.md §5 checkpoint/resume).
EMA tensors live inside the state, so checkpoints are EMA-complete by
construction (reference keeps them as ema_* buffers, ema_hooks.py:56-64).
"""
from __future__ import annotations

import json
import os
import os.path as osp
from typing import Any, Dict, Optional, Tuple

import msgpack
import numpy as np


def _tree_to_flat(tree, prefix=()):  # -> dict[str, np.ndarray]
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_tree_to_flat(v, prefix + (k,)))
    else:
        out['/'.join(prefix)] = np.asarray(tree)
    return out


def _flat_to_tree(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split('/')
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return tree


def save_variables(path: str, variables: Dict, meta: Optional[Dict] = None):
    """Save flax variables ({'params': ..., 'batch_stats': ...}) + meta."""
    flat = _tree_to_flat(variables)
    payload = {
        'meta': json.dumps(meta or {}),
        'arrays': {
            k: {
                'dtype': str(v.dtype),
                'shape': list(v.shape),
                'data': v.tobytes()
            }
            for k, v in flat.items()
        },
    }
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    with open(path, 'wb') as f:
        f.write(msgpack.packb(payload))


def load_variables(path: str) -> Tuple[Dict, Dict]:
    with open(path, 'rb') as f:
        payload = msgpack.unpackb(f.read())
    meta = json.loads(payload['meta'])
    flat = {
        k: np.frombuffer(rec['data'],
                         dtype=np.dtype(rec['dtype'])).reshape(rec['shape'])
        for k, rec in payload['arrays'].items()
    }
    return _flat_to_tree(flat), meta


def save_train_state(ckpt_dir: str, state, step: int):
    """Orbax save of the full TrainState (params+EMA+opt+step)."""
    import orbax.checkpoint as ocp
    ckpt_dir = osp.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        mngr.save(step, args=ocp.args.StandardSave(state))
        mngr.wait_until_finished()


def load_train_state(ckpt_dir: str, abstract_state, step: Optional[int] = None):
    import orbax.checkpoint as ocp
    ckpt_dir = osp.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        step = mngr.latest_step() if step is None else step
        return mngr.restore(step,
                            args=ocp.args.StandardRestore(abstract_state))


def latest_step(ckpt_dir: str) -> Optional[int]:
    import orbax.checkpoint as ocp
    if not osp.isdir(ckpt_dir):
        return None
    with ocp.CheckpointManager(osp.abspath(ckpt_dir)) as mngr:
        return mngr.latest_step()


def load_train_state_raw(ckpt_dir: str, step: Optional[int] = None):
    """Orbax restore WITHOUT an abstract-state template (raw pytree) —
    used by tools/model_converters/publish_model.py to extract weights
    from a train-state directory without rebuilding the model."""
    import orbax.checkpoint as ocp
    ckpt_dir = osp.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        step = mngr.latest_step() if step is None else step
        return mngr.restore(step)
