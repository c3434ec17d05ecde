"""Bridge that lets the PyTorch reference at /root/reference run live on
CPU as a golden parity oracle for tpudet tests.

It puts the local mmcv/pycocotools/terminaltables shims plus the
reference repo root on sys.path, then pre-seeds stub modules for the
reference's compiled extensions (mmdet.ops Cython/CUDA kernels) so the
pure-python mmdet code imports cleanly.

The reference code itself is never copied — it is imported read-only
from /root/reference and executed to produce golden outputs.
"""
import importlib
import os.path as osp
import sys
import types

REF_ROOT = '/root/reference'
SHIM_DIR = osp.join(osp.dirname(osp.abspath(__file__)), '_shim')

_ready = False


def reference_available():
    return osp.isdir(osp.join(REF_ROOT, 'mmdet'))


def _seed_stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _unavailable(name):
    def fn(*args, **kwargs):
        raise NotImplementedError(f'{name} native kernel unavailable in '
                                  'oracle bridge')
    return fn


def setup():
    """Idempotent: make `import mmdet` resolve to the reference."""
    global _ready
    if _ready:
        return
    if not reference_available():
        raise RuntimeError('reference repo not found')
    # shims first so they shadow nothing real; reference root next
    for p in (SHIM_DIR, REF_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)

    # Pre-seed compiled-extension stubs (checked before the real package
    # dirs by the import machinery).
    import torch.nn as nn

    class _Mish(nn.Module):
        def __init__(self, inplace=False):
            super().__init__()

        def forward(self, x):
            import torch.nn.functional as F
            import torch
            return x * torch.tanh(F.softplus(x))

    class _MishCuda(_Mish):
        pass

    ops = _seed_stub('mmdet.ops', Mish=_Mish, MishCuda=_MishCuda,
                     mish=_unavailable('mish'))
    _seed_stub('mmdet.ops.mish_cuda', Mish=_Mish, MishCuda=_MishCuda)
    eval_utils = _seed_stub('mmdet.ops.eval_utils')
    _seed_stub('mmdet.ops.eval_utils.iou',
               iou_coco=_unavailable('iou_coco'))
    _seed_stub('mmdet.ops.eval_utils.match',
               match_coco=_unavailable('match_coco'),
               match_best_only=_unavailable('match_best_only'))
    eval_utils.iou = sys.modules['mmdet.ops.eval_utils.iou']
    eval_utils.match = sys.modules['mmdet.ops.eval_utils.match']
    ops.eval_utils = eval_utils

    # register the Mish activation like mmdet/ops/mish_cuda/mish.py does
    from mmcv.cnn.bricks.registry import ACTIVATION_LAYERS
    if ACTIVATION_LAYERS.get('Mish') is None:
        ACTIVATION_LAYERS.register_module('Mish', module=_Mish)

    _ready = True


def ref_import(name):
    """Import a module from the reference (after setup)."""
    setup()
    return importlib.import_module(name)


def to_numpy(x):
    import numpy as np
    import torch
    if isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy()
    if isinstance(x, (list, tuple)):
        return type(x)(to_numpy(v) for v in x)
    return np.asarray(x)


def load_fixture(name):
    """Load a reference tests/test_onnx/data fixture (list of tensors)."""
    import pickle
    path = osp.join(REF_ROOT, 'tests', 'test_onnx', 'data', name)
    with open(path, 'rb') as f:
        return pickle.load(f)
