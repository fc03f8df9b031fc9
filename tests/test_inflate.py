"""First-party DEFLATE decoder (native/inflate.h): parity + hostile input.

The decoder replaces libdeflate on the PNG inference hot path
(decode_png_batch pairs), so its contract is pinned here directly:
byte-exact output vs zlib across compression levels/strategies and
content classes, correct pair interleaving, and nonzero return codes
(never a crash, never silent truncation) on malformed streams.
"""

import ctypes
import zlib

import numpy as np
import pytest

from effocr_tpu import native

if not native.available():  # pragma: no cover
    pytest.skip("native preproc unavailable", allow_module_level=True)

_lib = native._load()
_lib.fast_zlib_inflate.restype = ctypes.c_int
_lib.fast_zlib_inflate.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t]
_lib.fast_zlib_inflate_pair.restype = None
_lib.fast_zlib_inflate_pair.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
    ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]


def _inflate(comp, out_n):
    buf = ctypes.create_string_buffer(out_n) if out_n else None
    rc = _lib.fast_zlib_inflate(comp, len(comp), buf, out_n)
    return rc, (buf.raw if buf else b"")


def _cases():
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, 200_000, dtype=np.uint8).tobytes()
    text = (b"the quick brown fox jumps over the lazy dog " * 3000)
    runs = b"".join(bytes([i % 7]) * (50 + i % 200) for i in range(500))
    mixed = noise[:50_000] + text[:50_000] + runs[:50_000] + b"\x00" * 10_000
    return {"noise": noise, "text": text, "runs": runs, "mixed": mixed,
            "empty": b"", "one": b"x", "short": b"abc" * 5}


def test_parity_all_levels_and_strategies():
    for name, raw in _cases().items():
        for level in (0, 1, 6, 9):
            comp = zlib.compress(raw, level)
            rc, out = _inflate(comp, len(raw))
            assert rc == 0, (name, level, rc)
            assert out == raw, (name, level)
    # fixed-Huffman blocks (strategy Z_FIXED)
    raw = _cases()["text"]
    co = zlib.compressobj(6, zlib.DEFLATED, 15, 8, zlib.Z_FIXED)
    comp = co.compress(raw) + co.flush()
    rc, out = _inflate(comp, len(raw))
    assert rc == 0 and out == raw


def test_pair_matches_singles():
    cases = _cases()
    raws = [cases["noise"], cases["text"], cases["runs"], cases["mixed"]]
    for i in range(len(raws)):
        for j in range(len(raws)):
            a, b = raws[i], raws[j]
            ca, cb = zlib.compress(a, 6), zlib.compress(b, 9)
            ba = ctypes.create_string_buffer(len(a))
            bb = ctypes.create_string_buffer(len(b))
            ra, rb = ctypes.c_int(-7), ctypes.c_int(-7)
            _lib.fast_zlib_inflate_pair(ca, len(ca), ba, len(a),
                                        cb, len(cb), bb, len(b),
                                        ctypes.byref(ra), ctypes.byref(rb))
            assert ra.value == 0 and ba.raw == a, (i, j)
            assert rb.value == 0 and bb.raw == b, (i, j)


def test_malformed_inputs_fail_closed():
    raw = b"hello world" * 1000
    good = zlib.compress(raw, 6)

    # truncation at every region of the stream
    for cut in (1, 2, 5, len(good) // 2, len(good) - 5):
        rc, _ = _inflate(good[:cut], len(raw))
        assert rc != 0, cut
    # header corruption
    rc, _ = _inflate(b"\x00\x00" + good[2:], len(raw))
    assert rc != 0
    # FDICT flag set -> unsupported, must refuse not misparse
    hdr = bytes([good[0], good[1] | 0x20])
    rc, _ = _inflate(hdr + good[2:], len(raw))
    assert rc != 0
    # wrong declared output size (both directions)
    rc, _ = _inflate(good, len(raw) - 1)
    assert rc != 0
    rc, _ = _inflate(good, len(raw) + 1)
    assert rc != 0
    # random garbage bodies: any rc is fine, just no crash/overwrite
    rng = np.random.default_rng(1)
    for _ in range(50):
        junk = bytes([0x78, 0x9C]) + rng.integers(
            0, 256, 300, dtype=np.uint8).tobytes()
        n = 4096
        buf = ctypes.create_string_buffer(n + 64)
        _lib.fast_zlib_inflate(junk, len(junk), buf, n)
        assert buf.raw[n:] == b"\x00" * 64  # guard bytes untouched


def test_pair_one_bad_one_good():
    raw = b"abcdef" * 2000
    good = zlib.compress(raw, 6)
    bad = good[: len(good) // 2]
    ba = ctypes.create_string_buffer(len(raw))
    bb = ctypes.create_string_buffer(len(raw))
    ra, rb = ctypes.c_int(-7), ctypes.c_int(-7)
    _lib.fast_zlib_inflate_pair(bad, len(bad), ba, len(raw),
                                good, len(good), bb, len(raw),
                                ctypes.byref(ra), ctypes.byref(rb))
    assert ra.value != 0
    assert rb.value == 0 and bb.raw == raw


def test_stored_blocks():
    # level 0 => stored blocks incl. the 65535-byte split path
    raw = bytes(range(256)) * 1024          # 256 KiB, crosses block splits
    comp = zlib.compress(raw, 0)
    rc, out = _inflate(comp, len(raw))
    assert rc == 0 and out == raw
