"""ctypes binding for the native preprocessing library (preproc.cpp).

Compiles the shared library on first use with g++ -O3 (cached next to the
source); falls back cleanly when no compiler is available — callers check
``available()`` and use the Python/cv2 path otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "preproc.cpp")
_LIB = os.path.join(_HERE, "libpreproc.so")

_lib = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
             "-fPIC", "-pthread", _SRC, "-o", _LIB],
            check=True, capture_output=True,
        )
        return _LIB
    except (OSError, subprocess.CalledProcessError):
        return None


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    u8pp = ctypes.POINTER(ctypes.c_uint8)
    lib.letterbox_batch.argtypes = [
        ctypes.POINTER(u8pp), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint8, ctypes.c_int, u8pp,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.letterbox_gray_batch.argtypes = [
        ctypes.POINTER(u8pp), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint8,
        ctypes.c_int, u8pp, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.crop_square_batch.argtypes = [
        ctypes.POINTER(u8pp), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, u8pp,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _img_ptrs(images: Sequence[np.ndarray], channels: int = 3):
    u8pp = ctypes.POINTER(ctypes.c_uint8)
    ptrs = (u8pp * len(images))()
    hs = (ctypes.c_int * len(images))()
    ws = (ctypes.c_int * len(images))()
    for i, im in enumerate(images):
        assert im.dtype == np.uint8 and im.ndim == 3
        assert im.shape[2] == channels, (im.shape, channels)
        assert im.flags["C_CONTIGUOUS"]
        ptrs[i] = im.ctypes.data_as(u8pp)
        hs[i] = im.shape[0]
        ws[i] = im.shape[1]
    return ptrs, hs, ws


def letterbox_batch(
    images: Sequence[np.ndarray], size: int = 640, pad_val: int = 114,
    num_threads: int = 8, out_h: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """-> (out [N,out_h,size,C] u8, ratios [N] f32, tops [N] i32, lefts [N])."""
    lib = _load()
    assert lib is not None, "native preproc unavailable"
    n = len(images)
    oh = out_h or size
    channels = images[0].shape[2]
    out = np.empty((n, oh, size, channels), np.uint8)
    ratios = np.empty((n,), np.float32)
    tops = np.empty((n,), np.int32)
    lefts = np.empty((n,), np.int32)
    ptrs, hs, ws = _img_ptrs(images, channels)
    u8pp = ctypes.POINTER(ctypes.c_uint8)
    lib.letterbox_batch(
        ptrs, hs, ws, n, oh, size, channels, pad_val, num_threads,
        out.ctypes.data_as(u8pp),
        ratios.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tops.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        lefts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, ratios, tops, lefts


def letterbox_gray_batch(
    images: Sequence[np.ndarray], size: int = 640, pad_val: int = 114,
    num_threads: int = 8, out_h: Optional[int] = None, pack_bits: int = 8,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Fused letterbox + grayscale (+ optional sub-byte pack) for the
    grayscale inference pipeline.  Accepts RGB (channel-mean gray, numpy
    truncating semantics) or single-channel images.

    -> (out [N, out_h, size * pack_bits / 8] u8, ratios, tops, lefts):
    pack_bits 4 = two pixels/byte (hi nibble first), 2 = four pixels/byte
    MSB-first.
    """
    lib = _load()
    assert lib is not None, "native preproc unavailable"
    assert pack_bits in (2, 4, 8)
    n = len(images)
    oh = out_h or size
    channels = images[0].shape[2]
    ow = size * pack_bits // 8
    assert size % (8 // pack_bits) == 0, (size, pack_bits)
    out = np.empty((n, oh, ow), np.uint8)
    ratios = np.empty((n,), np.float32)
    tops = np.empty((n,), np.int32)
    lefts = np.empty((n,), np.int32)
    ptrs, hs, ws = _img_ptrs(images, channels)
    u8pp = ctypes.POINTER(ctypes.c_uint8)
    lib.letterbox_gray_batch(
        ptrs, hs, ws, n, oh, size, channels, pack_bits, pad_val,
        num_threads, out.ctypes.data_as(u8pp),
        ratios.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tops.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        lefts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, ratios, tops, lefts


def crop_square_batch(
    images: Sequence[np.ndarray], rects: np.ndarray, img_idx: np.ndarray,
    out_size: int = 224, num_threads: int = 8,
) -> np.ndarray:
    """Crop + white-square-pad + resize; -> [N, out_size, out_size, 3] u8."""
    lib = _load()
    assert lib is not None, "native preproc unavailable"
    n = int(rects.shape[0])
    out = np.empty((n, out_size, out_size, 3), np.uint8)
    ptrs, hs, ws = _img_ptrs(images)
    rects = np.ascontiguousarray(rects, np.int32)
    img_idx = np.ascontiguousarray(img_idx, np.int32)
    u8pp = ctypes.POINTER(ctypes.c_uint8)
    lib.crop_square_batch(
        ptrs, hs, ws,
        rects.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        img_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n, out_size, num_threads, out.ctypes.data_as(u8pp),
    )
    return out
