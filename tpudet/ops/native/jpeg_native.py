"""ctypes binding for the native fused JPEG->letterbox loader.

The reference's decode hot path is turbojpeg selected per-pipeline
(/root/reference/mmdet/datasets/pipelines/loading.py:35-41); its
letterbox is Python mmcv.imrescale. Here both run inside one C++ call
(`jpeg_loader.cc`) with an internal thread pool, so a whole batch is
decoded+letterboxed GIL-free. Falls back to cv2 when no compiler /
libjpeg is available; semantics of the two paths match (parity test:
tests/test_data/test_jpeg_native.py).
"""
from __future__ import annotations

import ctypes
import os.path as osp
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, 'jpeg_loader.cc')
_SO = osp.join(_HERE, '_jpeg_loader.so')

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC,
             '-o', _SO, '-ljpeg', '-pthread'],
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
    u8 = ctypes.c_ubyte
    lib.jl_decode_letterbox.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int, u8,
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS'),
        np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS'),
        np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')]
    lib.jl_decode_letterbox.restype = ctypes.c_int
    lib.jl_decode_letterbox_batch.argtypes = [
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_char_p),
        np.ctypeslib.ndpointer(np.uintp, flags='C_CONTIGUOUS'),
        ctypes.c_int, ctypes.c_int, u8, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS'),
        np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS'),
        np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS'),
        np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')]
    lib.jl_decode_letterbox_batch.restype = None
    lib.jl_jpeg_info.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.jl_jpeg_info.restype = ctypes.c_int
    lib.jl_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
        np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS')]
    lib.jl_decode.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def jpeg_info(jpeg: bytes) -> Optional[Tuple[int, int]]:
    """(h, w) from the header only, or None on failure/unavailable."""
    lib = load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.jl_jpeg_info(jpeg, len(jpeg), ctypes.byref(h),
                        ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def decode(jpeg: bytes, bgr: bool = True) -> Optional[np.ndarray]:
    """Full-size decode -> [h, w, 3] uint8 (BGR by default, like cv2),
    or None on failure/unavailable. Bit-identical to cv2.imdecode for
    baseline 3-channel JPEGs (both are libjpeg-turbo underneath)."""
    lib = load()
    if lib is None:
        return None
    hw = jpeg_info(jpeg)
    if hw is None:
        return None
    h, w = hw
    if h <= 0 or w <= 0:
        return None
    out = np.empty((h, w, 3), np.uint8)
    if lib.jl_decode(jpeg, len(jpeg), int(bgr), out) != 0:
        return None
    return out


def decode_letterbox(jpeg: bytes, out_h: int, out_w: int,
                     pad_val: int = 0, bgr: bool = True,
                     fast_scale: bool = False
                     ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Fused decode + letterbox of one image.

    Returns (canvas[out_h,out_w,3] uint8, scale_factor[4] = [sw,sh,sw,sh])
    or None when the native library is unavailable or decoding fails.
    """
    lib = load()
    if lib is None:
        return None
    out = np.empty((out_h, out_w, 3), np.uint8)
    scale = np.empty(2, np.float32)
    new_hw = np.empty(2, np.int32)
    rc = lib.jl_decode_letterbox(jpeg, len(jpeg), out_h, out_w, pad_val,
                                 int(bgr), int(fast_scale), out, scale,
                                 new_hw)
    if rc != 0:
        return None
    sw, sh = float(scale[0]), float(scale[1])
    return out, np.array([sw, sh, sw, sh], np.float32)


def decode_letterbox_batch(jpegs: List[bytes], out_h: int, out_w: int,
                           pad_val: int = 0, bgr: bool = True,
                           fast_scale: bool = False, n_threads: int = 0
                           ) -> Optional[Tuple[np.ndarray, np.ndarray,
                                               np.ndarray]]:
    """Thread-pooled batch decode.

    Returns (canvases[n,out_h,out_w,3], scale_factors[n,4], status[n]) or
    None when the native library is unavailable. status[i] != 0 marks a
    failed decode (its canvas is all pad_val).
    """
    lib = load()
    if lib is None:
        return None
    n = len(jpegs)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    scales = np.zeros((n, 2), np.float32)
    new_hws = np.zeros((n, 2), np.int32)
    status = np.zeros(n, np.int32)
    if n == 0:
        return out, np.zeros((0, 4), np.float32), status
    bufs = (ctypes.c_char_p * n)(*jpegs)
    lens = np.array([len(b) for b in jpegs], np.uintp)
    lib.jl_decode_letterbox_batch(
        n, bufs, lens, out_h, out_w, pad_val, int(bgr), int(fast_scale),
        n_threads, out, scales, new_hws, status)
    sf = np.concatenate([scales, scales], axis=1)  # [sw,sh,sw,sh]
    return out, sf.astype(np.float32), status
