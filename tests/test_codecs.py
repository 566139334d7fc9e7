"""Unit tests for the stdlib-only PNG/WAV codecs backing
mm_decode_png / mm_decode_wav — including decoding PNGs that use
scanline filters our encoder never emits (Sub/Up/Average/Paeth), so
the decoder is proven general, not merely the encoder's inverse."""

from __future__ import annotations

import struct
import zlib

import numpy as np

from lsd_spark.llm.multimodal import _make_png_codec, _make_wav_codec


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _filter_scanline(ftype: int, line: np.ndarray, prev: np.ndarray, nch: int) -> bytes:
    """Apply a PNG filter (encoder side) per the public spec."""
    n = len(line)
    out = np.zeros(n, dtype=np.int32)
    cur = line.astype(np.int32)
    pr = prev.astype(np.int32)
    for x in range(n):
        a = cur[x - nch] if x >= nch else 0
        b = pr[x]
        c = pr[x - nch] if x >= nch else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[x] = (cur[x] - pred) & 0xFF
    return bytes([ftype]) + out.astype(np.uint8).tobytes()


def test_png_roundtrip_filter0():
    encode, decode = _make_png_codec()
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(11, 5, 3), dtype=np.uint8)
    h, w, nch, back = decode(encode(arr))
    assert (h, w, nch) == (11, 5, 3)
    assert np.array_equal(back, arr)


def test_png_decode_all_filter_types():
    """Handcraft a PNG whose five rows use filters 0..4; the decoder
    must reconstruct the original pixels exactly."""
    _, decode = _make_png_codec()
    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    stride = 4 * 3
    raw = b""
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(5):
        line = arr[y].reshape(-1)
        raw += _filter_scanline(y, line, prev, 3)
        prev = line
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    h, w, nch, back = decode(png)
    assert (h, w, nch) == (5, 4, 3)
    assert np.array_equal(back, arr)


def test_png_decode_greyscale_and_rgba():
    """Color types 0 and 6 parse with correct channel counts."""
    _, decode = _make_png_codec()
    for ctype, nch in ((0, 1), (6, 4)):
        rng = np.random.default_rng(ctype)
        arr = rng.integers(0, 256, size=(3, 2, nch), dtype=np.uint8)
        stride = 2 * nch
        raw = b"".join(b"\x00" + arr[y].reshape(-1).tobytes() for y in range(3))
        ihdr = struct.pack(">IIBBBBB", 2, 3, 8, ctype, 0, 0, 0)
        png = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )
        h, w, got_nch, back = decode(png)
        assert (h, w, got_nch) == (3, 2, nch)
        assert np.array_equal(back, arr)


def test_wav_roundtrip():
    encode, decode = _make_wav_codec()
    rng = np.random.default_rng(5)
    samples = rng.integers(-32768, 32767, size=320, dtype=np.int16)
    n, rate, back = decode(encode(samples, rate=16000))
    assert n == 320 and rate == 16000
    assert np.array_equal(back, samples)
