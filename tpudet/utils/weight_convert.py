"""Execution-order weight conversion between a PyTorch reference model
and a tpudet flax model.

Both frameworks apply their primitive layers (conv / batchnorm / linear)
in identical data-flow order when the architectures match, so instead of
maintaining brittle name maps we:

1. record the flax module paths of every Conv/BatchNorm/Dense call, in
   execution order, by initializing under ``nn.intercept_methods``;
2. record the torch leaf modules (nn.Conv2d/BatchNorm2d/Linear) in
   execution order with forward pre-hooks (done on the torch side, see
   ``tools/model_converters/ref2tpudet.py`` / tests/ref_oracle);
3. zip the two sequences with strict shape checking, transposing conv
   kernels OIHW -> HWIO.

A shape mismatch at any position means the data flow differs — the
converter fails loudly rather than silently mis-assigning weights.

Used by the golden-parity tests (tests/ref_oracle/test_fork_model_parity)
and by the checkpoint converter CLI for users migrating reference
checkpoints (reference analogue: tools/model_converters/).
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import numpy as np


def flax_layer_order(module: nn.Module, *init_args,
                     method=None, **init_kwargs) -> List[Tuple[str, str]]:
    """Paths of Conv/BatchNorm/Dense sub-modules in execution order.

    Returns list of ('/'.join(path), kind) with kind in
    {'conv', 'bn', 'dense'}; duplicates (shared/reused modules) keep the
    first occurrence.
    """
    order: List[Tuple[str, str]] = []
    seen = set()

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name == '__call__':
            kind = None
            if isinstance(mod, nn.Conv):
                kind = 'conv'
            elif isinstance(mod, nn.BatchNorm):
                kind = 'bn'
            elif isinstance(mod, nn.Dense):
                kind = 'dense'
            if kind is not None:
                path = '/'.join(mod.scope.path)
                if path not in seen:
                    seen.add(path)
                    order.append((path, kind))
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        if method is None:
            module.init(jax.random.PRNGKey(0), *init_args, **init_kwargs)
        else:
            module.init(jax.random.PRNGKey(0), *init_args, method=method,
                        **init_kwargs)
    return order


def _get_subtree(tree: Dict, path: str) -> Dict:
    node = tree
    for part in path.split('/'):
        node = node[part]
    return node


def _set_subtree(tree: Dict, path: str, value: Dict) -> None:
    parts = path.split('/')
    node = tree
    for part in parts[:-1]:
        node = node[part]
    node[parts[-1]] = value


def assign_torch_sequence(variables: Dict[str, Any],
                          flax_order: List[Tuple[str, str]],
                          torch_layers: List[Dict[str, np.ndarray]],
                          strict: bool = True,
                          dense_chw_to_hwc: Dict[str, Tuple[int, int, int]]
                          = None) -> Dict[str, Any]:
    """Assign torch layer tensors (numpy, execution order) into a flax
    variables dict ({'params': ..., 'batch_stats': ...}).

    ``torch_layers`` entries are dicts with keys:
      conv:  kind='conv', weight (O,I,H,W), optional bias (O,)
      bn:    kind='bn', weight, bias, running_mean, running_var
      dense: kind='dense', weight (O,I), optional bias

    ``dense_chw_to_hwc``: {flax-path substring: (C, H, W)} for Dense
    layers that sit directly on a flattened conv feature map (e.g. the
    first shared FC of a bbox head on 7x7 RoI features,
    reference convfc_bbox_head.py:149 ``x.flatten(1)``). Torch flattens
    (C, H, W) row-major; flax flattens NHWC (H, W, C) — the dense input
    dimension must be permuted C*H*W -> H*W*C or the converted layer is
    silently wrong despite matching shapes.
    """
    import flax
    variables = flax.core.unfreeze(variables)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})

    if len(flax_order) != len(torch_layers):
        raise ValueError(
            f'layer count mismatch: flax has {len(flax_order)} '
            f'conv/bn/dense calls, torch has {len(torch_layers)}')

    for (path, kind), t in zip(flax_order, torch_layers):
        if t['kind'] != kind:
            raise ValueError(f'kind mismatch at {path}: flax {kind} vs '
                             f'torch {t["kind"]} ({t.get("name")})')
        if kind == 'conv':
            node = _get_subtree(params, path)
            w = np.transpose(t['weight'], (2, 3, 1, 0))  # OIHW -> HWIO
            groups = 1
            if node['kernel'].shape != w.shape:
                # grouped conv: flax stores (H, W, in/groups, out) too —
                # same layout; only a true mismatch fails
                raise ValueError(
                    f'conv shape mismatch at {path} '
                    f'({t.get("name")}): flax {node["kernel"].shape} '
                    f'torch {w.shape} groups={groups}')
            node['kernel'] = w.astype(node['kernel'].dtype)
            if 'bias' in t and t['bias'] is not None:
                if 'bias' not in node:
                    raise ValueError(f'torch conv has bias but flax conv at '
                                     f'{path} does not')
                node['bias'] = t['bias'].astype(node['bias'].dtype)
            elif 'bias' in node:
                raise ValueError(f'flax conv at {path} has bias but torch '
                                 'conv does not')
        elif kind == 'dense':
            node = _get_subtree(params, path)
            w_t = t['weight']
            for frag, (c, h, wd) in (dense_chw_to_hwc or {}).items():
                if frag in path:
                    o = w_t.shape[0]
                    w_t = (w_t.reshape(o, c, h, wd)
                           .transpose(0, 2, 3, 1).reshape(o, h * wd * c))
                    break
            w = np.transpose(w_t, (1, 0))
            if node['kernel'].shape != w.shape:
                raise ValueError(f'dense shape mismatch at {path}: '
                                 f'{node["kernel"].shape} vs {w.shape}')
            node['kernel'] = w.astype(node['kernel'].dtype)
            if 'bias' in t and t['bias'] is not None and 'bias' in node:
                node['bias'] = t['bias'].astype(node['bias'].dtype)
        else:  # bn
            pnode = _get_subtree(params, path)
            snode = _get_subtree(batch_stats, path)
            if pnode['scale'].shape != t['weight'].shape:
                raise ValueError(f'bn shape mismatch at {path}: '
                                 f'{pnode["scale"].shape} vs '
                                 f'{t["weight"].shape}')
            pnode['scale'] = t['weight'].astype(pnode['scale'].dtype)
            pnode['bias'] = t['bias'].astype(pnode['bias'].dtype)
            snode['mean'] = t['running_mean'].astype(snode['mean'].dtype)
            snode['var'] = t['running_var'].astype(snode['var'].dtype)

    variables['params'] = params
    if batch_stats:
        variables['batch_stats'] = batch_stats
    return flax.core.freeze(variables) if isinstance(
        variables, flax.core.FrozenDict) else variables


def torch_module_sequence(torch_model, forward_fn) -> List[Dict]:
    """Run ``forward_fn(torch_model)`` with pre-hooks recording leaf
    conv/bn/linear modules in execution order (dedup by id).

    torch is imported lazily — only parity tests / converter CLIs that
    have a torch checkpoint need it.
    """
    import torch
    import torch.nn as tnn

    order: List[Dict] = []
    seen = set()
    hooks = []

    def make_hook(name, mod):
        def hook(module, inputs):
            if id(module) in seen:
                return
            seen.add(id(module))
            if isinstance(module, tnn.Conv2d):
                order.append(dict(
                    kind='conv', name=name,
                    weight=module.weight.detach().numpy(),
                    bias=None if module.bias is None else
                    module.bias.detach().numpy()))
            elif isinstance(module, tnn.BatchNorm2d):
                order.append(dict(
                    kind='bn', name=name,
                    weight=module.weight.detach().numpy(),
                    bias=module.bias.detach().numpy(),
                    running_mean=module.running_mean.detach().numpy(),
                    running_var=module.running_var.detach().numpy()))
            elif isinstance(module, tnn.Linear):
                order.append(dict(
                    kind='dense', name=name,
                    weight=module.weight.detach().numpy(),
                    bias=None if module.bias is None else
                    module.bias.detach().numpy()))
        return hook

    for name, mod in torch_model.named_modules():
        if isinstance(mod, (tnn.Conv2d, tnn.BatchNorm2d, tnn.Linear)):
            hooks.append(mod.register_forward_pre_hook(make_hook(name, mod)))
    try:
        with torch.no_grad():
            forward_fn(torch_model)
    finally:
        for h in hooks:
            h.remove()
    return order


def torch_module_refs(torch_model, forward_fn) -> List:
    """Like :func:`torch_module_sequence` but returns the live module
    objects (execution order) instead of copied tensors — used by the
    REVERSE converter that loads tpudet weights into a torch reference
    model for two-stack A/B runs."""
    import torch
    import torch.nn as tnn

    order: List = []
    seen = set()
    hooks = []

    def make_hook(mod):
        def hook(module, inputs):
            if id(module) not in seen:
                seen.add(id(module))
                order.append(module)
        return hook

    for _, mod in torch_model.named_modules():
        if isinstance(mod, (tnn.Conv2d, tnn.BatchNorm2d, tnn.Linear)):
            hooks.append(mod.register_forward_pre_hook(make_hook(mod)))
    try:
        with torch.no_grad():
            forward_fn(torch_model)
    finally:
        for h in hooks:
            h.remove()
    return order


def assign_flax_to_torch(variables: Dict[str, Any],
                         flax_order: List[Tuple[str, str]],
                         torch_modules: List) -> None:
    """Copy flax variables into torch modules, zipping the two
    execution-order sequences (inverse of :func:`assign_torch_sequence`;
    same loud shape checking). Mutates the torch modules in place."""
    import torch
    import torch.nn as tnn

    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    if len(flax_order) != len(torch_modules):
        raise ValueError(
            f'layer count mismatch: flax has {len(flax_order)} '
            f'conv/bn/dense calls, torch has {len(torch_modules)}')
    for (path, kind), mod in zip(flax_order, torch_modules):
        if kind == 'conv':
            if not isinstance(mod, tnn.Conv2d):
                raise ValueError(f'kind mismatch at {path}: flax conv vs '
                                 f'torch {type(mod).__name__}')
            node = _get_subtree(params, path)
            w = np.transpose(np.asarray(node['kernel'], np.float32),
                             (3, 2, 0, 1))  # HWIO -> OIHW
            if tuple(mod.weight.shape) != w.shape:
                raise ValueError(f'conv shape mismatch at {path}: torch '
                                 f'{tuple(mod.weight.shape)} flax {w.shape}')
            mod.weight.data.copy_(torch.from_numpy(w))
            if 'bias' in node:
                if mod.bias is None:
                    raise ValueError(f'flax conv at {path} has bias but '
                                     'torch conv does not')
                mod.bias.data.copy_(torch.from_numpy(
                    np.asarray(node['bias'], np.float32)))
            elif mod.bias is not None:
                raise ValueError(f'torch conv has bias but flax conv at '
                                 f'{path} does not')
        elif kind == 'dense':
            if not isinstance(mod, tnn.Linear):
                raise ValueError(f'kind mismatch at {path}: flax dense vs '
                                 f'torch {type(mod).__name__}')
            node = _get_subtree(params, path)
            w = np.transpose(np.asarray(node['kernel'], np.float32), (1, 0))
            if tuple(mod.weight.shape) != w.shape:
                raise ValueError(f'dense shape mismatch at {path}')
            mod.weight.data.copy_(torch.from_numpy(w))
            if 'bias' in node and mod.bias is not None:
                mod.bias.data.copy_(torch.from_numpy(
                    np.asarray(node['bias'], np.float32)))
        else:  # bn
            if not isinstance(mod, tnn.BatchNorm2d):
                raise ValueError(f'kind mismatch at {path}: flax bn vs '
                                 f'torch {type(mod).__name__}')
            pnode = _get_subtree(params, path)
            snode = _get_subtree(batch_stats, path)
            if tuple(mod.weight.shape) != np.asarray(pnode['scale']).shape:
                raise ValueError(f'bn shape mismatch at {path}')
            mod.weight.data.copy_(torch.from_numpy(
                np.asarray(pnode['scale'], np.float32)))
            mod.bias.data.copy_(torch.from_numpy(
                np.asarray(pnode['bias'], np.float32)))
            mod.running_mean.data.copy_(torch.from_numpy(
                np.asarray(snode['mean'], np.float32)))
            mod.running_var.data.copy_(torch.from_numpy(
                np.asarray(snode['var'], np.float32)))
