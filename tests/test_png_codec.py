"""Pure-NumPy PNG codec (operators/multimodal.py) — no Spark needed.

Decode is validated against an independent forward-filterer: known pixels
are filtered per the PNG spec (each of the five filter types), deflated,
chunk-wrapped, and the decoder must recover the original pixels exactly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from py_image_dedup_spark.operators.multimodal import (
    decode_png,
    encode_png,
    is_png,
)

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(cid: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + cid + body
            + struct.pack(">I", zlib.crc32(cid + body)))


def _forward_filter(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Reference implementation of the PNG FORWARD filters (spec §9):
    produces the filtered byte stream the decoder must invert."""
    h, w, ch = px.shape
    rows = px.reshape(h, w * ch).astype(np.int64)
    out = b""
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        cur = rows[y]
        ft = ftypes[y % len(ftypes)]
        filt = np.empty_like(cur)
        for i in range(w * ch):
            a = cur[i - ch] if i >= ch else 0  # left (reconstructed)
            b = prev[i]                         # up
            c = prev[i - ch] if i >= ch else 0  # up-left
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[i] = (cur[i] - pred) % 256
        out += bytes([ft]) + bytes(filt.astype(np.uint8).tolist())
        prev = cur
    return out


def _build_png(px: np.ndarray, ctype: int, ftypes: list[int]) -> bytes:
    h, w, ch = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    idat = zlib.compress(_forward_filter(px, ftypes))
    return (PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def _expected_gray(px: np.ndarray) -> np.ndarray:
    f = px.astype(np.float64)
    rgb = f[:, :, :3] if px.shape[2] >= 3 else np.repeat(f[:, :, :1], 3, axis=2)
    return rgb.mean(axis=2)


def test_decode_every_filter_type_rgb():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    for ftypes in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        data = _build_png(px, ctype=2, ftypes=ftypes)
        w, h, gray = decode_png(data)
        assert (w, h) == (7, 10)
        np.testing.assert_allclose(gray, _expected_gray(px))


def test_decode_gray_and_rgba():
    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, size=(5, 6, 1), dtype=np.uint8)
    w, h, gray = decode_png(_build_png(g, ctype=0, ftypes=[4]))
    assert (w, h) == (6, 5)
    np.testing.assert_allclose(gray, _expected_gray(g))
    rgba = rng.integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
    w, h, gray = decode_png(_build_png(rgba, ctype=6, ftypes=[3]))
    # alpha must be ignored: gray comes from RGB only
    np.testing.assert_allclose(gray, _expected_gray(rgba))


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    data = encode_png(px)
    assert is_png(data)
    w, h, gray = decode_png(data)
    assert (w, h) == (13, 9)
    np.testing.assert_allclose(gray, _expected_gray(px))


def test_multi_idat_and_rejects():
    # split the IDAT stream across two chunks — decoders must concatenate
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 6, 6, 8, 2, 0, 0, 0)
    idat = zlib.compress(_forward_filter(px, [2]))
    cut = len(idat) // 2
    data = (PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat[:cut])
            + _chunk(b"IDAT", idat[cut:]) + _chunk(b"IEND", b""))
    _, _, gray = decode_png(data)
    np.testing.assert_allclose(gray, _expected_gray(px))

    import pytest

    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # 16-bit depth unsupported -> clean error, not garbage pixels
    bad = (PNG_SIG
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
           + _chunk(b"IDAT", zlib.compress(b"\x00" * 26))
           + _chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(bad)
