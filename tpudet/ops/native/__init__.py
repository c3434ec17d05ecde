"""ctypes loader for the native eval kernels, with on-demand g++ build.

The reference builds its eval kernels as Cython extensions at install time
(setup.py:166-180); this environment has no Cython/pybind11, so the C++
file is compiled once into a shared object next to the source and loaded
via ctypes. Falls back cleanly (callers use the numpy implementations in
tpudet/evaluation/mean_ap.py) if no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, 'match_coco.cc')
_SO = osp.join(_HERE, '_match_coco.so')

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC, '-o', _SO],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not osp.exists(_SO) or osp.getmtime(_SO) < osp.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
    u8p = np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS')
    i32p = np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')
    lib.iou_coco_native.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int,
                                    u8p, f32p]
    lib.iou_coco_native.restype = None
    lib.match_coco_native.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                      f32p, ctypes.c_int, u8p, u8p, i32p]
    lib.match_coco_native.restype = None
    lib.match_best_only_native.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, u8p, u8p,
        i32p]
    lib.match_best_only_native.restype = None
    _lib = lib
    return _lib


def iou_coco_native(det_boxes: np.ndarray, gt_boxes: np.ndarray,
                    is_crowd: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    det = np.ascontiguousarray(det_boxes, np.float32)
    gt = np.ascontiguousarray(gt_boxes, np.float32)
    crowd = np.ascontiguousarray(is_crowd, np.uint8)
    out = np.empty((len(det), len(gt)), np.float32)
    lib.iou_coco_native(det, len(det), gt, len(gt), crowd, out)
    return out


def match_coco_native(iou_mat: np.ndarray, iou_thrs: np.ndarray,
                      is_ignore: np.ndarray,
                      is_crowd: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    iou = np.ascontiguousarray(iou_mat, np.float32)
    thrs = np.ascontiguousarray(iou_thrs, np.float32)
    ign = np.ascontiguousarray(is_ignore, np.uint8)
    crowd = np.ascontiguousarray(is_crowd, np.uint8)
    d, g = iou.shape
    out = np.empty((len(thrs), d), np.int32)
    lib.match_coco_native(iou, d, g, thrs, len(thrs), ign, crowd, out)
    return out


def match_best_only_native(iou_mat: np.ndarray, iou_thrs: np.ndarray,
                           is_ignore: np.ndarray,
                           is_crowd: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    iou = np.ascontiguousarray(iou_mat, np.float32)
    thrs = np.ascontiguousarray(iou_thrs, np.float32)
    ign = np.ascontiguousarray(is_ignore, np.uint8)
    crowd = np.ascontiguousarray(is_crowd, np.uint8)
    d, g = iou.shape
    out = np.empty((len(thrs), d), np.int32)
    lib.match_best_only_native(iou, d, g, thrs, len(thrs), ign, crowd, out)
    return out
