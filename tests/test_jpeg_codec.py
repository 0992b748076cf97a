"""Pure-NumPy baseline JPEG codec (operators/jpeg.py) — no Spark needed.

The grayscale encoder doubles as the decoder's roundtrip oracle; the
multi-component / subsampled / restart-marker decode paths are validated
against a test-local 4:2:0 color encoder built from the module's own
primitive helpers (forward direction only — the decoder must invert it).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from py_image_dedup_spark.operators.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    ZIGZAG,
    _BitWriter,
    _DCT_C,
    _huff_encode_map,
    _magnitude,
    _quality_qtable,
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
)


def _test_image(h: int, w: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    return (
        128 + 90 * np.sin(x / 9.0) * np.cos(y / 7.0)
        + rng.normal(0, 6, (h, w))
    ).clip(0, 255)


def test_roundtrip_quality_ladder():
    img = _test_image(41, 57)  # non-multiple-of-8 dims on purpose
    for q, tol in ((95, 2.5), (85, 5.0), (50, 10.0)):
        data = encode_jpeg(img, quality=q)
        assert is_jpeg(data)
        w, h, dec = decode_jpeg(data)
        assert (w, h) == (57, 41)
        assert np.abs(dec - img).mean() < tol


def test_smooth_image_near_exact():
    y, x = np.mgrid[0:24, 0:32]
    smooth = (y * 2.0 + x * 1.5).clip(0, 255)
    _, _, dec = decode_jpeg(encode_jpeg(smooth, 95))
    assert np.abs(dec - smooth).mean() < 0.5


def test_flat_and_tiny_blocks():
    flat = np.full((16, 16), 200.0)
    _, _, d = decode_jpeg(encode_jpeg(flat, 85))
    assert np.abs(d - flat).max() < 2
    _, _, d1 = decode_jpeg(encode_jpeg(np.array([[37.0]]), 85))
    assert d1.shape == (1, 1) and abs(float(d1[0, 0]) - 37) < 20


def test_zrl_long_zero_run():
    """A lone high-frequency coefficient forces the 16-zero-run (ZRL)
    encode path; the decoder must land it in the right cell."""
    img = np.zeros((8, 8))
    img[7, 7] = 255.0
    _, _, dec = decode_jpeg(encode_jpeg(img, 95))
    assert float(dec[7, 7]) > 200
    assert np.abs(dec - img).mean() < 2


def test_non_jpeg_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnope")
    assert not is_jpeg(b"BMnope")


def test_lossless_sof3_rejected():
    """Unsupported coding processes must raise, not misdecode."""
    data = bytearray(encode_jpeg(np.full((8, 8), 100.0), 85))
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC3
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))


# ----------------------------------------- progressive (SOF2, Annex G)

def test_progressive_equals_baseline_decode():
    """Same quantized coefficients, two coding processes: the progressive
    stream (spectral selection + successive approximation, the default
    scan script) must decode to EXACTLY the baseline stream's pixels."""
    from py_image_dedup_spark.operators.jpeg import encode_jpeg_progressive

    img = _test_image(41, 57)
    for q in (95, 85, 50):
        base = decode_jpeg(encode_jpeg(img, quality=q))[2]
        prog_bytes = encode_jpeg_progressive(img, quality=q)
        w, h, prog = decode_jpeg(prog_bytes)
        assert (w, h) == (57, 41)
        assert np.array_equal(prog, base), f"quality {q} mismatch"


def test_progressive_spectral_only_script():
    """Spectral selection without successive approximation (Al=0
    everywhere) — the other common scan-script family."""
    from py_image_dedup_spark.operators.jpeg import encode_jpeg_progressive

    img = _test_image(24, 31, seed=3)
    scans = ((0, 0, 0, 0), (1, 2, 0, 0), (3, 63, 0, 0))
    base = decode_jpeg(encode_jpeg(img, quality=85))[2]
    prog = decode_jpeg(encode_jpeg_progressive(img, 85, scans))[2]
    assert np.array_equal(prog, base)


def test_progressive_eob_runs_on_flat_image():
    """A flat image quantizes to all-zero AC bands -> maximal EOB runs
    (EOBn with r > 0), the path a single-block oracle never exercises."""
    from py_image_dedup_spark.operators.jpeg import encode_jpeg_progressive

    img = np.full((64, 64), 77.0)
    base = decode_jpeg(encode_jpeg(img, quality=85))[2]
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=85))[2]
    assert np.array_equal(prog, base)
    assert np.abs(prog - img).mean() < 2.0


def test_progressive_single_block_and_odd_dims():
    from py_image_dedup_spark.operators.jpeg import encode_jpeg_progressive

    for shape in ((8, 8), (5, 3), (9, 17)):
        img = _test_image(*shape, seed=11)
        base = decode_jpeg(encode_jpeg(img, quality=90))[2]
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=90))[2]
        assert np.array_equal(prog, base), shape


# -------------------------- test-local 4:2:0 color encoder (forward oracle)

def _encode_block(bw, block, qt2, pred, dc_map, ac_map):
    coef = _DCT_C @ (block - 128.0) @ _DCT_C.T
    q = np.round(coef / qt2).astype(np.int64).reshape(64)
    zz = q[ZIGZAG]
    s, code = _magnitude(int(zz[0]) - pred)
    hc, hl = dc_map[s]
    bw.write(hc, hl)
    if s:
        bw.write(code, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            hc, hl = ac_map[0x00]
            bw.write(hc, hl)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            hc, hl = ac_map[0xF0]
            bw.write(hc, hl)
            run -= 16
        s, code = _magnitude(v)
        hc, hl = ac_map[(run << 4) | s]
        bw.write(hc, hl)
        bw.write(code, s)
        run = 0
    return int(zz[0])


def _encode_color_420(ypl, cb, cr, quality=90, dri=0):
    """Minimal interleaved 4:2:0 color JPEG (luma tables for every
    component — legal per T.81). Dims must be multiples of 16; cb/cr are
    the half-resolution planes. Optional restart interval `dri` in MCUs."""
    h, w = ypl.shape
    assert h % 16 == 0 and w % 16 == 0
    qt = _quality_qtable(quality)
    qt2 = qt.reshape(8, 8)
    dc_map = _huff_encode_map(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_map = _huff_encode_map(AC_LUMA_BITS, AC_LUMA_VALS)
    bw = _BitWriter()
    preds = [0, 0, 0]
    out_ecs = bytearray()
    mcux, mcuy = w // 16, h // 16
    rst = 0
    m = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and m and m % dri == 0:
                out_ecs += bw.flush()
                out_ecs += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw = _BitWriter()
                preds = [0, 0, 0]
            for by in range(2):
                for bx in range(2):
                    blk = ypl[
                        my * 16 + by * 8: my * 16 + by * 8 + 8,
                        mx * 16 + bx * 8: mx * 16 + bx * 8 + 8,
                    ]
                    preds[0] = _encode_block(
                        bw, blk, qt2, preds[0], dc_map, ac_map
                    )
            for ci, plane in ((1, cb), (2, cr)):
                blk = plane[my * 8: my * 8 + 8, mx * 8: mx * 8 + 8]
                preds[ci] = _encode_block(
                    bw, blk, qt2, preds[ci], dc_map, ac_map
                )
            m += 1
    out_ecs += bw.flush()

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    qt_zz = qt[ZIGZAG].astype(np.uint8)
    dqt = seg(0xDB, bytes([0x00]) + qt_zz.tobytes())
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
              + bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    parts = [b"\xff\xd8", dqt, sof, dht]
    if dri:
        parts.append(seg(0xDD, struct.pack(">H", dri)))
    parts.append(seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])))
    parts.append(bytes(out_ecs))
    parts.append(b"\xff\xd9")
    return b"".join(parts)


def test_color_420_decode_recovers_luma():
    """Interleaved 3-component 4:2:0 stream: the decoder must step over
    the chroma blocks in the bitstream and recover the luma plane."""
    ypl = _test_image(32, 48, seed=3)
    cb = _test_image(16, 24, seed=4) * 0.5 + 64
    cr = _test_image(16, 24, seed=5) * 0.5 + 64
    data = _encode_color_420(ypl, cb, cr, quality=90)
    w, h, dec = decode_jpeg(data)
    assert (w, h) == (48, 32)
    assert np.abs(dec - ypl).mean() < 4


def test_color_420_with_restart_markers():
    """DRI/RSTn: DC predictors reset and the bitstream re-aligns at every
    restart — a wrong implementation shears the image after the first
    marker."""
    ypl = _test_image(32, 48, seed=11)
    cb = np.full((16, 24), 90.0)
    cr = np.full((16, 24), 150.0)
    data = _encode_color_420(ypl, cb, cr, quality=90, dri=2)
    w, h, dec = decode_jpeg(data)
    assert (w, h) == (48, 32)
    assert np.abs(dec - ypl).mean() < 4


# ----------------- test-local progressive 4:2:0 color encoder (forward)

def _quant_planes(ypl, cb, cr, quality):
    """Per-component zigzag coefficient blocks, raster order (the
    decoder's non-interleaved walk; dims % 16 == 0 keeps the MCU-aligned
    grid equal to the T.81 A.2.2 ceil grid for every component)."""
    qt2 = _quality_qtable(quality).reshape(8, 8)

    def blocks(plane):
        out = []
        for y0 in range(0, plane.shape[0], 8):
            for x0 in range(0, plane.shape[1], 8):
                coef = _DCT_C @ (plane[y0:y0 + 8, x0:x0 + 8] - 128.0) \
                    @ _DCT_C.T
                out.append(np.round(coef / qt2).astype(np.int64)
                           .reshape(64)[ZIGZAG])
        return out

    return [blocks(np.asarray(p, dtype=np.float64)) for p in (ypl, cb, cr)]


def _mcu_order(mcux: int, mcuy: int):
    """(ci, raster_block_index) sequence in interleaved 4:2:0 MCU order:
    2x2 luma, then one Cb, one Cr per MCU."""
    order = []
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(2):
                for bx in range(2):
                    order.append((0, (my * 2 + by) * mcux * 2 + mx * 2 + bx))
            order.append((1, my * mcux + mx))
            order.append((2, my * mcux + mx))
    return order


def _ecs_with_restarts(encode_chunk, units, dri: int) -> bytes:
    """Entropy-coded segments: a fresh bit-writer (and predictor reset,
    handled by encode_chunk) per restart interval, RSTn cycling 0-7."""
    step = dri if dri else len(units)
    out = bytearray()
    rst = 0
    for i in range(0, len(units), step):
        if i:
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
        bw = _BitWriter()
        encode_chunk(bw, units[i:i + step])
        out += bw.flush()
    return bytes(out)


def _encode_color_420_progressive(ypl, cb, cr, quality=90, dri=0):
    """Progressive (SOF2) interleaved-DC 4:2:0 color JPEG from the
    module's own band encoders: DC first Al=1 (interleaved, ns=3),
    spectral-selection AC first scans per component, then the DC refine
    bit — the multi-component Annex G shapes the grayscale progressive
    oracle can't reach. Quantization matches _encode_color_420, so both
    must decode bit-identically."""
    from py_image_dedup_spark.operators.jpeg import (
        PROG_AC_BITS, PROG_AC_VALS, PROG_DC_BITS, PROG_DC_VALS,
        _enc_ac_first,
    )

    h, w = ypl.shape
    assert h % 16 == 0 and w % 16 == 0
    comp_blocks = _quant_planes(ypl, cb, cr, quality)
    dc_map = _huff_encode_map(PROG_DC_BITS, PROG_DC_VALS)
    ac_map = _huff_encode_map(PROG_AC_BITS, PROG_AC_VALS)
    order = _mcu_order(w // 16, h // 16)
    mcu_sz = 6  # blocks per MCU: 4 Y + Cb + Cr

    def dc_first_chunk(bw, units):
        preds = [0, 0, 0]
        for ci, bi in units:
            v = int(comp_blocks[ci][bi][0]) >> 1  # Al=1, arithmetic shift
            s, code = _magnitude(v - preds[ci])
            preds[ci] = v
            hc, hl = dc_map[s]
            bw.write(hc, hl)
            if s:
                bw.write(code, s)

    def dc_refine_chunk(bw, units):
        for ci, bi in units:
            bw.write(int(comp_blocks[ci][bi][0]) & 1, 1)

    def ac_first_chunk(ss, se):
        def run(bw, units):
            _enc_ac_first(bw, ac_map, units, ss, se, 0)
        return run

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    qt = _quality_qtable(quality)
    parts = [
        b"\xff\xd8",
        seg(0xDB, bytes([0x00]) + qt[ZIGZAG].astype(np.uint8).tobytes()),
        seg(0xC2, struct.pack(">BHHB", 8, h, w, 3)
            + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])),
        seg(0xC4, bytes([0x00]) + bytes(PROG_DC_BITS) + bytes(PROG_DC_VALS)
            + bytes([0x10]) + bytes(PROG_AC_BITS) + bytes(PROG_AC_VALS)),
    ]
    if dri:
        parts.append(seg(0xDD, struct.pack(">H", dri)))
    # interleaved DC first scan, Al=1 (restart interval counts MCUs)
    parts.append(seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 1])))
    parts.append(_ecs_with_restarts(
        dc_first_chunk, order, dri * mcu_sz if dri else 0,
    ))
    # per-component AC first scans, spectral selection on luma
    for cs, ci, ss, se in ((1, 0, 1, 5), (2, 1, 1, 63),
                           (3, 2, 1, 63), (1, 0, 6, 63)):
        parts.append(seg(0xDA, bytes([1, cs, 0x00, ss, se, 0])))
        parts.append(_ecs_with_restarts(
            ac_first_chunk(ss, se), comp_blocks[ci], dri,
        ))
    # interleaved DC refine scan (Ah=1 -> Al=0)
    parts.append(seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x10])))
    parts.append(_ecs_with_restarts(
        dc_refine_chunk, order, dri * mcu_sz if dri else 0,
    ))
    parts.append(b"\xff\xd9")
    return b"".join(parts)


def test_color_progressive_matches_baseline_color_decode():
    """Multi-component progressive: interleaved DC (MCU order, 4:2:0
    sampling factors) + per-component spectral-selection AC + DC
    successive approximation must reconstruct the SAME luma plane as the
    baseline color encoding of identical quantized coefficients."""
    ypl = _test_image(32, 48, seed=21)
    cb = _test_image(16, 24, seed=22) * 0.5 + 64
    cr = _test_image(16, 24, seed=23) * 0.5 + 64
    wp, hp, dec_prog = decode_jpeg(
        _encode_color_420_progressive(ypl, cb, cr, quality=90)
    )
    wb, hb, dec_base = decode_jpeg(_encode_color_420(ypl, cb, cr, quality=90))
    assert (wp, hp) == (wb, hb) == (48, 32)
    assert np.array_equal(dec_prog, dec_base)
    assert np.abs(dec_prog - ypl).mean() < 4


def test_color_progressive_with_restart_markers():
    """DRI across progressive scan types: restart interval counts MCUs in
    the interleaved DC scans and blocks in the non-interleaved AC scans;
    predictors, EOB runs and bit alignment all reset at each RSTn."""
    ypl = _test_image(32, 48, seed=31)
    cb = np.full((16, 24), 90.0)
    cr = np.full((16, 24), 150.0)
    plain = decode_jpeg(_encode_color_420_progressive(ypl, cb, cr, 90))[2]
    with_rst = decode_jpeg(
        _encode_color_420_progressive(ypl, cb, cr, 90, dri=2)
    )[2]
    assert np.array_equal(plain, with_rst)
