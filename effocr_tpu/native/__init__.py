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
_HDRS = [os.path.join(_HERE, "inflate.h")]
_LIB = os.path.join(_HERE, "libpreproc.so")

_lib = None
_tried = False


def _build() -> Optional[str]:
    src_mtime = max(os.path.getmtime(p) for p in [_SRC] + _HDRS
                    if os.path.exists(p))
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= src_mtime:
        return _LIB
    # -ffp-contract=off: the resize keeps explicit mul+add float math so
    # the AVX2 lanes and their scalar tails round identically (an FMA
    # contraction in one but not the other would split them by 1 ulp)
    base = ["g++", "-O3", "-march=native", "-ffp-contract=off",
            "-std=c++17", "-shared", "-fPIC", "-pthread", _SRC, "-o", _LIB]
    # libdeflate inflates ~2x faster than zlib for the PNG decoder; fall
    # back to zlib (always present) when it is not installed
    for extra in (["-DUSE_LIBDEFLATE", "-ldeflate"], ["-lz"]):
        try:
            subprocess.run(base + extra, check=True, capture_output=True)
            return _LIB
        except (OSError, subprocess.CalledProcessError):
            continue
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
    lib.decode_png_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(u8pp), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),
    ]
    lib.decode_letterbox_gray_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint8, ctypes.c_int,
        u8pp, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
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


def decode_png_batch(
    paths: Sequence[str], shapes: Sequence[Tuple[int, int, int]],
    num_threads: int = 8,
) -> Tuple[List[Optional[np.ndarray]], np.ndarray]:
    """First-party PNG decode (preproc.cpp decode_png_batch): libdeflate/
    zlib inflate + unfilter over a thread pool, replacing per-image PIL
    decode on the inference hot path.  shapes are (h, w, out_channels)
    per image — channels 1 decodes RGB sources via the truncating channel
    mean ((r+g+b)//3, the pipeline's documented gray semantics).

    -> (arrays, status): arrays[i] is [h, w, ch] u8 when status[i] == 0,
    None otherwise (unsupported subformat/corrupt file; caller falls back
    to PIL).  Supported natively: 8-bit, color type 0/2, non-interlaced.
    """
    lib = _load()
    assert lib is not None, "native preproc unavailable"
    n = len(paths)
    assert len(shapes) == n
    u8pp = ctypes.POINTER(ctypes.c_uint8)
    outs = [np.empty(s, np.uint8) for s in shapes]
    ptrs = (u8pp * n)()
    hs = (ctypes.c_int * n)()
    ws = (ctypes.c_int * n)()
    chs = (ctypes.c_int * n)()
    cpaths = (ctypes.c_char_p * n)()
    for i, (p, s, arr) in enumerate(zip(paths, shapes, outs)):
        assert s[2] in (1, 3), s
        ptrs[i] = arr.ctypes.data_as(u8pp)
        hs[i], ws[i], chs[i] = s[0], s[1], s[2]
        cpaths[i] = os.fsencode(p)
    status = np.empty((n,), np.int32)
    lib.decode_png_batch(
        cpaths, n, ptrs, hs, ws, chs, num_threads,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return [a if st == 0 else None for a, st in zip(outs, status)], status


def decode_png(
    path: str, h: int, w: int, channels: int
) -> Optional[np.ndarray]:
    """Single-image native PNG decode; None -> caller falls back to PIL."""
    arrs, _ = decode_png_batch([path], [(h, w, channels)], num_threads=1)
    return arrs[0]


def decode_letterbox_gray_batch(
    paths: Sequence[str], shapes: Sequence[Tuple[int, int]],
    size: int, out: np.ndarray, pad_val: int = 114, num_threads: int = 8,
    out_h: Optional[int] = None, pack_bits: int = 8,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Fused PNG decode -> gray letterbox -> pack, straight from file
    paths into the caller's canvas buffer (one native pass per image —
    no intermediate arrays cross the language boundary).

    ``out`` must be a C-contiguous uint8 buffer whose first
    ``len(paths)`` planes are [out_h, size * pack_bits / 8].  Returns
    (ratios, tops, lefts), or None if ANY image failed native decode
    (the caller redoes the chunk via the two-step path; the buffer
    contents are then undefined).  Results are bit-identical to
    decode_png_batch + letterbox_gray_batch.
    """
    lib = _load()
    assert lib is not None, "native preproc unavailable"
    assert pack_bits in (2, 4, 8)
    n = len(paths)
    oh = out_h or size
    assert size % (8 // pack_bits) == 0, (size, pack_bits)
    assert out.dtype == np.uint8 and out.flags["C_CONTIGUOUS"]
    assert out.size >= n * oh * (size * pack_bits // 8), (out.shape, n)
    ratios = np.empty((n,), np.float32)
    tops = np.empty((n,), np.int32)
    lefts = np.empty((n,), np.int32)
    status = np.empty((n,), np.int32)
    hs = (ctypes.c_int * n)()
    ws = (ctypes.c_int * n)()
    cpaths = (ctypes.c_char_p * n)()
    for i, (p, s) in enumerate(zip(paths, shapes)):
        hs[i], ws[i] = int(s[0]), int(s[1])
        cpaths[i] = os.fsencode(p)
    u8pp = ctypes.POINTER(ctypes.c_uint8)
    lib.decode_letterbox_gray_batch(
        cpaths, hs, ws, n, oh, size, pack_bits, pad_val, num_threads,
        out.ctypes.data_as(u8pp),
        ratios.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tops.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        lefts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if (status != 0).any():
        return None
    return ratios, tops, lefts


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
