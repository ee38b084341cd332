"""ctypes bindings for the native C++ data-loader (librcfd_native.so).

Compiled on first use (g++ -O3, links libpng/libjpeg); falls back to
None when the toolchain or libraries are unavailable — callers degrade to
the PIL path in rcfd_tpu.data.io.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, 'dataloader.cpp'),
         os.path.join(_DIR, 'roi_pool_golden.cpp')]
_SO = os.path.join(_DIR, 'librcfd_native.so')

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', *_SRCS,
           '-o', _SO + '.tmp', '-lpng', '-ljpeg', '-lz', '-lpthread']
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(_SO + '.tmp', _SO)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        needs_build = (not os.path.exists(_SO) or any(
            os.path.getmtime(_SO) < os.path.getmtime(s) for s in _SRCS))
        if needs_build and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.rcfd_png_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.rcfd_png_read_depth.argtypes = [
            ctypes.c_char_p, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
        lib.rcfd_png_write_depth.argtypes = [
            ctypes.c_char_p, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
        lib.rcfd_image_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.rcfd_image_read_rgb.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int]
        lib.rcfd_batch_read.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.rcfd_roi_pool_golden.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_float, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.rcfd_roi_pool_golden.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def probe(path: str):
    lib = get_lib()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.rcfd_image_probe(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f'probe failed ({rc}): {path}')
    return h.value, w.value


def read_depth(path: str, multiplier: float = 256.0) -> np.ndarray:
    lib = get_lib()
    h, w = probe(path)
    out = np.empty((h, w), np.float32)
    rc = lib.rcfd_png_read_depth(path.encode(), multiplier, _fptr(out), h, w)
    if rc != 0:
        raise IOError(f'depth decode failed ({rc}): {path}')
    return out


def write_depth(path: str, depth: np.ndarray, multiplier: float = 256.0):
    lib = get_lib()
    depth = np.ascontiguousarray(depth, np.float32)
    rc = lib.rcfd_png_write_depth(path.encode(), multiplier, _fptr(depth),
                                  depth.shape[0], depth.shape[1])
    if rc != 0:
        raise IOError(f'depth encode failed ({rc}): {path}')


def read_image(path: str) -> np.ndarray:
    lib = get_lib()
    h, w = probe(path)
    out = np.empty((h, w, 3), np.float32)
    rc = lib.rcfd_image_read_rgb(path.encode(), _fptr(out), h, w)
    if rc != 0:
        raise IOError(f'image decode failed ({rc}): {path}')
    return out


def _clamp_threads(n_threads: int) -> int:
    """Decode threads beyond the usable core count only thrash."""
    return max(1, min(n_threads, len(os.sched_getaffinity(0))
                      if hasattr(os, 'sched_getaffinity') else os.cpu_count()))


def batch_read_depth(paths: List[str], height: int, width: int,
                     multiplier: float = 256.0,
                     n_threads: int = 8) -> np.ndarray:
    """Decode a batch of depth PNGs in parallel (GIL released)."""
    lib = get_lib()
    out = np.empty((len(paths), height, width), np.float32)
    blob = b'\0'.join(p.encode() for p in paths) + b'\0'
    rc = lib.rcfd_batch_read(blob, len(paths), 0, multiplier, _fptr(out),
                             height, width, _clamp_threads(n_threads))
    if rc != 0:
        raise IOError(f'batch depth decode failed ({rc})')
    return out


def batch_read_images(paths: List[str], height: int, width: int,
                      n_threads: int = 8) -> np.ndarray:
    lib = get_lib()
    out = np.empty((len(paths), height, width, 3), np.float32)
    blob = b'\0'.join(p.encode() for p in paths) + b'\0'
    rc = lib.rcfd_batch_read(blob, len(paths), 1, 0.0, _fptr(out),
                             height, width, _clamp_threads(n_threads))
    if rc != 0:
        raise IOError(f'batch image decode failed ({rc})')
    return out


def roi_pool_golden(feat_nchw: np.ndarray, boxes: np.ndarray,
                    spatial_scale: float, output_size) -> np.ndarray:
    """Golden torchvision-semantics ROI max pool (C++ kernel, single
    image). feat_nchw (C, H, W) f32; boxes (K, 4) [x1, y1, x2, y2] in
    input coords. Returns (K, C, PH, PW)."""
    lib = get_lib()
    feat_nchw = np.ascontiguousarray(feat_nchw, np.float32)
    boxes = np.ascontiguousarray(boxes, np.float32)
    c, h, w = feat_nchw.shape
    k = boxes.shape[0]
    ph, pw = output_size
    out = np.empty((k, c, ph, pw), np.float32)
    lib.rcfd_roi_pool_golden(_fptr(feat_nchw), c, h, w, _fptr(boxes), k,
                             float(spatial_scale), ph, pw, _fptr(out))
    return out
