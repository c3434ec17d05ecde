import torch

from .base_module import BaseModule, ModuleList, Sequential
from .dist_utils import (allreduce_grads, allreduce_params, get_dist_info,
                         init_dist, master_only)
from .fp16_utils import auto_fp16, cast_tensor_type, force_fp32, \
    wrap_fp16_model
from .hooks import (HOOKS, CheckpointHook, DistSamplerSeedHook,
                    Fp16OptimizerHook, Hook, LrUpdaterHook, OptimizerHook)


def load_checkpoint(model, filename, map_location=None, strict=False,
                    logger=None, **kwargs):
    checkpoint = torch.load(filename, map_location=map_location or 'cpu')
    state_dict = checkpoint.get('state_dict', checkpoint)
    model.load_state_dict(state_dict, strict=strict)
    return checkpoint


def save_checkpoint(model, filename, optimizer=None, meta=None):
    torch.save({'state_dict': model.state_dict(), 'meta': meta or {}},
               filename)


def load_state_dict(module, state_dict, strict=False, logger=None):
    module.load_state_dict(state_dict, strict=strict)


class EpochBasedRunner:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError('shim has no runner')


class IterBasedRunner(EpochBasedRunner):
    pass


def build_runner(cfg, default_args=None):
    raise NotImplementedError('shim has no runner')


def get_host_info():
    return 'shim'


__all__ = [
    'BaseModule', 'ModuleList', 'Sequential', 'HOOKS', 'Hook',
    'OptimizerHook', 'Fp16OptimizerHook', 'DistSamplerSeedHook',
    'CheckpointHook', 'LrUpdaterHook', 'force_fp32', 'auto_fp16',
    'get_dist_info', 'init_dist', 'master_only', 'allreduce_grads',
    'allreduce_params', 'load_checkpoint', 'save_checkpoint',
    'load_state_dict', 'EpochBasedRunner', 'IterBasedRunner', 'build_runner',
    'wrap_fp16_model', 'cast_tensor_type', 'get_host_info',
]
