"""MP3 frame-header metadata parse (no decode) + the audio_meta kernel.

Synthetic MPEG frames are built byte-by-byte from the public header layout
(ISO/IEC 11172-3): 0xFF 0xFB = sync + MPEG1 + Layer III + no CRC; the
third byte packs bitrate index / sample-rate index / padding.
"""

from __future__ import annotations

import numpy as np

from py_image_dedup_spark.operators.multimodal import (
    audio_meta,
    encode_wav_pcm16,
    is_mp3,
    parse_mp3_meta,
)


def _frame(bitrate_idx: int = 9, sr_idx: int = 0, pad: int = 0,
           mono: bool = False) -> bytes:
    """One MPEG1 Layer III frame. bitrate_idx 9 = 128 kbps, sr_idx 0 =
    44100 Hz -> frame_len = 144*128000//44100 + pad = 417 + pad."""
    b3 = (bitrate_idx << 4) | (sr_idx << 2) | (pad << 1)
    b4 = 0xC0 if mono else 0x00
    hdr = bytes([0xFF, 0xFB, b3, b4])
    table = {9: 128, 10: 160, 11: 192}
    length = 144 * table[bitrate_idx] * 1000 // 44100 + pad
    return hdr + b"\x00" * (length - 4)


def _id3v2(payload_size: int = 200) -> bytes:
    # syncsafe size: 7 bits per byte
    sz = bytes([
        (payload_size >> 21) & 0x7F, (payload_size >> 14) & 0x7F,
        (payload_size >> 7) & 0x7F, payload_size & 0x7F,
    ])
    return b"ID3\x04\x00\x00" + sz + b"\xff" * payload_size


def test_mp3_cbr_duration_exact():
    data = _id3v2() + b"".join(_frame() for _ in range(76))
    assert is_mp3(data)
    m = parse_mp3_meta(data)
    assert m["sample_rate"] == 44100
    assert m["channels"] == 2
    assert m["bitrate_kbps"] == 128
    assert m["n_frames"] == 76
    assert abs(m["duration_s"] - 76 * 1152 / 44100) < 1e-6


def test_mp3_vbr_counts_frames_not_first_bitrate():
    """A Xing-less VBR stream: duration must come from counted frames, not
    an extrapolation of the first frame's bitrate."""
    frames = [_frame(9), _frame(11), _frame(10), _frame(11)] * 10
    m = parse_mp3_meta(b"".join(frames))
    assert m["n_frames"] == 40
    assert abs(m["duration_s"] - 40 * 1152 / 44100) < 1e-6
    assert m["bitrate_kbps"] == round((128 + 192 + 160 + 192) / 4)


def test_mp3_padding_and_mono():
    data = b"".join(_frame(pad=1, mono=True) for _ in range(5))
    m = parse_mp3_meta(data)
    assert m["n_frames"] == 5
    assert m["channels"] == 1


def test_mp3_resync_requires_frame_chain():
    # 0xFF garbage that never chains into a second frame must not parse
    try:
        parse_mp3_meta(b"\xff\xfb" + b"\x00" * 100)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_mp3_trailing_id3v1_tag_ignored():
    data = b"".join(_frame() for _ in range(3)) + b"TAG" + b"\x00" * 125
    m = parse_mp3_meta(data)
    assert m["n_frames"] == 3


def test_audio_meta_kernel_routes_by_container(spark):
    rate = 8000
    t = np.linspace(0.0, 1.0, rate, endpoint=False)
    wav = encode_wav_pcm16(np.sin(2 * np.pi * 440 * t), rate)
    mp3 = _id3v2() + b"".join(_frame() for _ in range(38))
    df = spark.createDataFrame(
        [("w", bytearray(wav)), ("m", bytearray(mp3)),
         ("x", bytearray(b"\x00garbage"))],
        "url string, payload binary",
    )
    got = {r["url"]: r for r in audio_meta(df).collect()}
    assert got["w"]["container"] == "wav"
    assert got["w"]["sample_rate"] == rate
    assert abs(got["w"]["duration_s"] - 1.0) < 1e-6
    assert got["m"]["container"] == "mp3"
    assert got["m"]["sample_rate"] == 44100
    assert abs(got["m"]["duration_s"] - 38 * 1152 / 44100) < 1e-6
    assert got["x"]["container"] == "unknown"
    assert got["x"]["duration_s"] is None


def _xing_frame(n_frames: int, n_bytes: int | None = None,
                mono: bool = False) -> bytes:
    """A first frame carrying a Xing VBR header: tag sits after the
    side-info block (MPEG1: 17 mono / 32 stereo, no CRC here)."""
    base = bytearray(_frame(mono=mono))
    pos = 4 + (17 if mono else 32)
    flags = 1 | (2 if n_bytes is not None else 0)
    tag = b"Xing" + flags.to_bytes(4, "big") + n_frames.to_bytes(4, "big")
    if n_bytes is not None:
        tag += n_bytes.to_bytes(4, "big")
    base[pos:pos + len(tag)] = tag
    return bytes(base)


def test_mp3_xing_header_read_but_duration_stays_exact():
    """VBR stream with a Xing frame: the xing_* fields surface the
    header's frame/byte counts (the first-frame-only duration estimate a
    streaming reader wants), while duration_s stays the exact frame-walk
    figure including the Xing frame itself."""
    audio = [_frame(9), _frame(11), _frame(10), _frame(11)] * 10
    data = _id3v2() + _xing_frame(40, n_bytes=sum(map(len, audio))) \
        + b"".join(audio)
    m = parse_mp3_meta(data)
    assert m["n_frames"] == 41  # Xing frame is a valid MPEG frame
    assert m["xing_frames"] == 40
    assert m["xing_bytes"] == sum(map(len, audio))
    assert abs(m["xing_duration_s"] - 40 * 1152 / 44100) < 1e-6
    assert abs(m["duration_s"] - 41 * 1152 / 44100) < 1e-6


def test_mp3_xing_mono_offset_and_info_tag():
    base = bytearray(_xing_frame(7, mono=True))
    pos = 4 + 17
    assert bytes(base[pos:pos + 4]) == b"Xing"
    base[pos:pos + 4] = b"Info"  # CBR encoders write 'Info', same layout
    m = parse_mp3_meta(bytes(base) + _frame(mono=True))
    assert m["xing_frames"] == 7
    assert m["xing_bytes"] is None
    assert m["channels"] == 1


def test_mp3_without_xing_reports_none():
    m = parse_mp3_meta(b"".join(_frame() for _ in range(3)))
    assert m["xing_frames"] is None
    assert m["xing_bytes"] is None
    assert m["xing_duration_s"] is None


def test_audio_meta_empty_wav_data_chunk_no_overflow(spark):
    """A structurally valid WAV whose data chunk is empty (crawl-truncated
    payload padded with trailer bytes) must classify as wav with a null
    bitrate — not overflow the Int32 bitrate column and fail the batch."""
    wav = encode_wav_pcm16(np.zeros(0), 8000) + b"\x00" * 300_000
    df = spark.createDataFrame(
        [("empty", bytearray(wav))], "url string, payload binary"
    )
    row = audio_meta(df).collect()[0]
    assert row["container"] == "wav"
    assert row["bitrate_kbps"] is None
    assert row["duration_s"] == 0.0


def test_audio_meta_zero_rate_wav_degrades_not_crashes(spark):
    """A fmt chunk declaring sample_rate=0 must be rejected by decode_wav
    as ValueError (tolerated per-row by audio_meta) — not reach the
    `len(mono) / rate` division, whose ZeroDivisionError is outside the
    tolerated tuple and would fail the whole Arrow batch (ADVICE r5)."""
    import struct as _s

    import pytest

    from py_image_dedup_spark.operators.multimodal import decode_wav

    wav = bytearray(encode_wav_pcm16(np.zeros(16), 8000))
    # sample_rate field: RIFF(12) + 'fmt '+size(8) + format,channels(4)
    _s.pack_into("<I", wav, 24, 0)
    with pytest.raises(ValueError):
        decode_wav(bytes(wav))
    df = spark.createDataFrame(
        [("zr", bytearray(wav))], "url string, payload binary"
    )
    row = audio_meta(df).collect()[0]
    assert row["container"] == "unknown"
    assert row["duration_s"] is None


def test_mp3_xing_with_crc_protection():
    """Protection bit 0 (CRC present): the 2-byte CRC sits between header
    and side info, shifting the Xing tag by 2 — the offset path a
    no-CRC-only test never exercises."""
    base = bytearray(_frame())
    base[1] = 0xFA  # MPEG1 Layer III, protection ON
    pos = 4 + 2 + 32  # header + CRC + stereo side info
    tag = b"Xing" + (1).to_bytes(4, "big") + (5).to_bytes(4, "big")
    base[pos:pos + len(tag)] = tag
    m = parse_mp3_meta(bytes(base) + _frame())
    assert m["xing_frames"] == 5
