"""ctypes bindings for the native image-preprocessing library
(csrc/image_ops.cpp). Auto-builds with make/g++ on first use; all callers
fall back to the PIL path if the toolchain or build is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_CSRC = os.path.abspath(os.path.join(os.path.dirname(__file__), '..', '..', 'csrc'))
_LIB_PATH = os.path.join(_CSRC, 'libhcp_image_ops.so')
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(['make', '-C', _CSRC], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.hcp_resize_crop_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8)] + [ctypes.c_int] * 8 + [
            ctypes.POINTER(ctypes.c_float)]
        lib.hcp_batch_resize_crop_normalize.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        assert lib.hcp_image_ops_version() == 1
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def resize_crop_normalize(img: np.ndarray, resize_wh: Tuple[int, int],
                          crop_xy: Tuple[int, int],
                          target_wh: Tuple[int, int]) -> np.ndarray:
    """uint8 [H,W,3] -> float32 [th,tw,3] in [-1,1] (native path)."""
    lib = get_lib()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    sh, sw = img.shape[:2]
    dw, dh = resize_wh
    cx, cy = crop_xy
    tw, th = target_wh
    out = np.empty((th, tw, 3), np.float32)
    lib.hcp_resize_crop_normalize(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        sh, sw, dh, dw, cy, cx, th, tw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def batch_resize_crop_normalize(imgs: List[np.ndarray],
                                resize_whs: List[Tuple[int, int]],
                                crop_xys: List[Tuple[int, int]],
                                target_wh: Tuple[int, int],
                                num_threads: int = 0) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    n = len(imgs)
    imgs = [np.ascontiguousarray(im, np.uint8) for im in imgs]
    tw, th = target_wh
    out = np.empty((n, th, tw, 3), np.float32)
    PtrU8 = ctypes.POINTER(ctypes.c_uint8)
    srcs = (PtrU8 * n)(*[im.ctypes.data_as(PtrU8) for im in imgs])
    arr = lambda vals: (ctypes.c_int * n)(*vals)
    sh = arr([im.shape[0] for im in imgs])
    sw = arr([im.shape[1] for im in imgs])
    dh = arr([wh[1] for wh in resize_whs])
    dw = arr([wh[0] for wh in resize_whs])
    cy = arr([xy[1] for xy in crop_xys])
    cx = arr([xy[0] for xy in crop_xys])
    lib.hcp_batch_resize_crop_normalize(
        srcs, sh, sw, dh, dw, cy, cx, th, tw, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads)
    return out
