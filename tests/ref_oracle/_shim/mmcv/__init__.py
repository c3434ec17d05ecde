"""Minimal mmcv shim (version spoofed into the reference's accepted
range) so that /root/reference's mmdet imports and runs on CPU torch as a
live parity oracle for tpudet tests."""
import json
import os
import pickle

__version__ = '1.3.9'

from .image import *  # noqa: F401,F403
from .utils import (Config, ConfigDict, Registry, build_from_cfg,  # noqa
                    concat_list, digit_version, get_git_hash, get_logger,
                    is_list_of, is_seq_of, is_str, is_tuple_of, print_log,
                    slice_list, to_2tuple)
from .utils.progressbar import (ProgressBar, track_iter_progress,  # noqa
                                track_parallel_progress, track_progress)
from .version import version_info  # noqa: F401


class FileClient:
    """Disk-only stand-in for mmcv.FileClient (reference
    pipelines/loading.py:54 instantiates it per transform)."""

    def __init__(self, backend='disk', **kwargs):
        if backend != 'disk':
            raise NotImplementedError(f'shim FileClient: {backend}')

    def get(self, filepath):
        with open(filepath, 'rb') as f:
            return f.read()

    def get_text(self, filepath, encoding='utf-8'):
        with open(filepath, encoding=encoding) as f:
            return f.read()


def mkdir_or_exist(dir_name, mode=0o777):
    if dir_name == '':
        return
    os.makedirs(os.path.expanduser(dir_name), mode=mode, exist_ok=True)


def load(file, file_format=None, **kwargs):
    if file_format is None:
        file_format = str(file).split('.')[-1]
    if file_format in ('pkl', 'pickle'):
        with open(file, 'rb') as f:
            return pickle.load(f)
    if file_format == 'json':
        with open(file) as f:
            return json.load(f)
    raise NotImplementedError(file_format)


def dump(obj, file=None, file_format=None, **kwargs):
    if file_format is None and file is not None:
        file_format = str(file).split('.')[-1]
    if file_format in ('pkl', 'pickle'):
        with open(file, 'wb') as f:
            pickle.dump(obj, f)
        return
    if file_format == 'json':
        if file is None:
            return json.dumps(obj)
        with open(file, 'w') as f:
            json.dump(obj, f)
        return
    raise NotImplementedError(file_format)


def jit(func=None, **kwargs):
    """mmcv.jit is a no-op passthrough outside parrots."""
    if callable(func):
        return func

    def wrapper(f):
        return f
    return wrapper


def imshow(img, win_name='', wait_time=0):
    pass


def color_val(color):
    colors = dict(red=(0, 0, 255), green=(0, 255, 0), blue=(255, 0, 0),
                  cyan=(255, 255, 0), yellow=(0, 255, 255),
                  magenta=(255, 0, 255), white=(255, 255, 255),
                  black=(0, 0, 0))
    if isinstance(color, str):
        return colors[color]
    if isinstance(color, tuple):
        return color
    return colors['green']
