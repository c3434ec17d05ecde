"""Minimal mmcv.utils shim (torch-side) for running the reference mmdet
code as a live parity oracle.  Written fresh against the mmcv 1.3 public
API surface — functional equivalents only, no mmcv code.
"""
import functools
import inspect
import logging
import sys

import torch

TORCH_VERSION = torch.__version__

_loggers = {}


def get_logger(name, log_file=None, log_level=logging.INFO):
    if name in _loggers:
        return _loggers[name]
    logger = logging.getLogger(name)
    handler = logging.StreamHandler(sys.stdout)
    logger.addHandler(handler)
    logger.setLevel(log_level)
    _loggers[name] = logger
    return logger


def print_log(msg, logger=None, level=logging.INFO):
    if logger is None or logger == 'silent':
        print(msg)
    elif isinstance(logger, logging.Logger):
        logger.log(level, msg)
    else:
        get_logger(str(logger)).log(level, msg)


def get_git_hash(fallback='unknown', digits=None):
    return fallback


def collect_env():
    return {'shim': True}


def is_str(x):
    return isinstance(x, str)


def is_seq_of(seq, expected_type, seq_type=None):
    if seq_type is None:
        exp_seq_type = (list, tuple)
    else:
        exp_seq_type = seq_type
    if not isinstance(seq, exp_seq_type):
        return False
    return all(isinstance(item, expected_type) for item in seq)


def is_list_of(seq, expected_type):
    return is_seq_of(seq, expected_type, seq_type=list)


def is_tuple_of(seq, expected_type):
    return is_seq_of(seq, expected_type, seq_type=tuple)


def slice_list(in_list, lens):
    if isinstance(lens, int):
        assert len(in_list) % lens == 0
        lens = [lens] * (len(in_list) // lens)
    out = []
    idx = 0
    for n in lens:
        out.append(in_list[idx:idx + n])
        idx += n
    return out


def concat_list(in_list):
    return list(_x for sub in in_list for _x in sub)


def to_ntuple(n):
    def parse(x):
        if isinstance(x, (list, tuple)):
            return tuple(x)
        return tuple([x] * n)
    return parse


to_1tuple = to_ntuple(1)
to_2tuple = to_ntuple(2)
to_3tuple = to_ntuple(3)
to_4tuple = to_ntuple(4)


def digit_version(version_str, length=4):
    out = []
    for x in version_str.split('.'):
        if x.isdigit():
            out.append(int(x))
        elif x.find('rc') != -1:
            p = x.split('rc')
            out.append(int(p[0]) - 1)
            out.append(int(p[1]))
    return tuple(out)


class _Missing:
    pass


class ConfigDict(dict):
    """addict-style dict with attribute access."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        for arg in args:
            if arg is None:
                continue
            for k, v in dict(arg).items():
                self[k] = self._hook(v)
        for k, v in kwargs.items():
            self[k] = self._hook(v)

    @classmethod
    def _hook(cls, item):
        if isinstance(item, dict) and not isinstance(item, ConfigDict):
            return cls(item)
        if isinstance(item, (list, tuple)):
            return type(item)(cls._hook(x) for x in item)
        return item

    def __setattr__(self, name, value):
        self[name] = self._hook(value)

    def __setitem__(self, name, value):
        super().__setitem__(name, self._hook(value))

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __deepcopy__(self, memo):
        import copy
        other = self.__class__()
        memo[id(self)] = other
        for k, v in self.items():
            dict.__setitem__(other, copy.deepcopy(k, memo),
                             copy.deepcopy(v, memo))
        return other

    def copy(self):
        return ConfigDict(dict(self))

    def pop(self, key, default=_Missing):
        if default is _Missing:
            return super().pop(key)
        return super().pop(key, default)


class Config:
    """Thin Config wrapper: attribute proxy over a ConfigDict."""

    def __init__(self, cfg_dict=None, cfg_text=None, filename=None):
        object.__setattr__(self, '_cfg_dict', ConfigDict(cfg_dict or {}))
        object.__setattr__(self, '_text', cfg_text or '')
        object.__setattr__(self, '_filename', filename)

    @property
    def filename(self):
        return self._filename

    @property
    def text(self):
        return self._text

    def __getattr__(self, name):
        return getattr(self._cfg_dict, name)

    def __setattr__(self, name, value):
        setattr(self._cfg_dict, name, value)

    def __getitem__(self, name):
        return self._cfg_dict[name]

    def __setitem__(self, name, value):
        self._cfg_dict[name] = value

    def __contains__(self, name):
        return name in self._cfg_dict

    def __iter__(self):
        return iter(self._cfg_dict)

    def get(self, key, default=None):
        return self._cfg_dict.get(key, default)

    def copy(self):
        return Config(self._cfg_dict.copy())


class Registry:
    """mmcv-style registry with parent/scope lookup."""

    def __init__(self, name, build_func=None, parent=None, scope=None):
        self._name = name
        self._module_dict = {}
        self._children = {}
        self._scope = scope or 'shim'
        self._parent = parent
        if parent is not None:
            parent._children[self._scope] = self
        if build_func is None:
            if parent is not None and getattr(parent, 'build_func', None):
                build_func = parent.build_func
            else:
                build_func = build_from_cfg
        self.build_func = build_func

    def __len__(self):
        return len(self._module_dict)

    def __contains__(self, key):
        return self.get(key) is not None

    @property
    def name(self):
        return self._name

    @property
    def module_dict(self):
        return self._module_dict

    def get(self, key):
        if key in self._module_dict:
            return self._module_dict[key]
        for child in self._children.values():
            if key in child._module_dict:
                return child._module_dict[key]
        if self._parent is not None:
            return self._parent.get(key)
        return None

    def build(self, *args, **kwargs):
        return self.build_func(*args, **kwargs, registry=self)

    def _register_module(self, module_class, module_name=None, force=False):
        if module_name is None:
            module_name = module_class.__name__
        names = [module_name] if isinstance(module_name, str) else module_name
        for name in names:
            if not force and name in self._module_dict:
                raise KeyError(f'{name} already registered in {self._name}')
            self._module_dict[name] = module_class

    def register_module(self, name=None, force=False, module=None):
        if module is not None:
            self._register_module(module, name, force)
            return module
        if inspect.isclass(name) or inspect.isfunction(name):
            self._register_module(name)
            return name

        def _register(cls):
            self._register_module(cls, name, force)
            return cls

        return _register

    # mmcv<1.3 compat
    def register(self, *args, **kwargs):
        return self.register_module(*args, **kwargs)


def build_from_cfg(cfg, registry, default_args=None):
    if not isinstance(cfg, dict):
        raise TypeError(f'cfg must be a dict, got {type(cfg)}')
    if 'type' not in cfg:
        if default_args is None or 'type' not in default_args:
            raise KeyError('cfg must contain the key "type"')
    args = cfg.copy()
    if default_args is not None:
        for name, value in default_args.items():
            args.setdefault(name, value)
    obj_type = args.pop('type')
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(f'{obj_type} is not in the {registry.name} registry')
    elif inspect.isclass(obj_type) or inspect.isfunction(obj_type):
        obj_cls = obj_type
    else:
        raise TypeError(f'type must be str or class, got {type(obj_type)}')
    return obj_cls(**args)


def deprecated_api_warning(name_dict, cls_name=None):
    def wrapper(old_func):
        @functools.wraps(old_func)
        def new_func(*args, **kwargs):
            for src, dst in name_dict.items():
                if src in kwargs:
                    kwargs[dst] = kwargs.pop(src)
            return old_func(*args, **kwargs)
        return new_func
    return wrapper


# progressbar submodule lives in progressbar.py
from .progressbar import (ProgressBar, track_iter_progress,  # noqa: E402
                          track_parallel_progress, track_progress)

__all__ = [
    'Registry', 'build_from_cfg', 'Config', 'ConfigDict', 'print_log',
    'get_logger', 'get_git_hash', 'collect_env', 'TORCH_VERSION',
    'is_str', 'is_list_of', 'is_tuple_of', 'is_seq_of', 'slice_list',
    'concat_list', 'to_1tuple', 'to_2tuple', 'to_3tuple', 'to_4tuple',
    'digit_version', 'deprecated_api_warning', 'ProgressBar',
    'track_iter_progress', 'track_parallel_progress', 'track_progress',
]
