"""Multimodal columns: binary payloads + typed metadata.

A training-data pipeline at 100 TB carries images/audio/video as opaque
`binary` columns beside typed metadata, and decodes only inside Arrow
batches at the last moment. The Spark-side plumbing here — schemas,
mapInPandas batch shape, partition sizing — is real and tested; the
codec kernels themselves are STUBBED deterministically because the
image/audio libraries are not in this container (decode_image raises
NotImplementedError unless `fake=True`, which produces a deterministic
pseudo-decode suitable for pipeline testing).

Pattern mirrors extract_text_udf (functions/normalize.py): payload ->
features is always Iterator[pd.DataFrame] -> Iterator[pd.DataFrame] over
Arrow, never per-row Python at the DataFrame level.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_FEATURES_SCHEMA = (
    "url string, width int, height int, n_bytes long, phash long"
)

FRAME_SAMPLE_SCHEMA = "url string, frame_idx int, frame_phash long"

AUDIO_FEATURES_SCHEMA = (
    "url string, n_bytes long, duration_s double, sample_rate int, "
    "loudness_fp long"
)

RESIZED_SCHEMA = "url string, width int, height int, payload binary"


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for an image decoder: derives a stable
    (width, height, 8x8 grayscale) from the payload bytes."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] * 8
    height = 64 + digest[1] * 8
    gray = np.frombuffer(digest, dtype=np.uint8)[:32].astype(np.float64)
    gray = np.concatenate([gray, gray])[:64].reshape(8, 8)
    return width, height, gray


def _phash64(gray8x8: np.ndarray) -> int:
    """Average-hash of an 8x8 grayscale block -> 64-bit fingerprint."""
    bits = (gray8x8 > gray8x8.mean()).flatten()
    out = 0
    for bit in bits:
        out = (out << 1) | int(bit)
    return out - (1 << 64) if out >= (1 << 63) else out


def image_features(
    df: DataFrame,
    payload_col: str = "payload",
    url_col: str = "url",
    fake: bool = False,
) -> DataFrame:
    """(url, payload binary) -> IMAGE_FEATURES_SCHEMA via mapInPandas.

    Real deployment: swap _fake_decode for PIL/libvips inside the same
    batch kernel; the Spark plan is identical.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decoding requires PIL/libvips (not in this "
                    "container); pass fake=True for the deterministic stub"
                )
            rows = []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                w, h, gray = _fake_decode(data)
                rows.append(
                    {
                        "url": url,
                        "width": w,
                        "height": h,
                        "n_bytes": len(data),
                        "phash": _phash64(gray),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["url", "width", "height", "n_bytes", "phash"],
            )

    return df.select(url_col, payload_col).mapInPandas(
        kernel, schema=IMAGE_FEATURES_SCHEMA
    )


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    url_col: str = "url",
    fake: bool = False,
) -> DataFrame:
    """(url, payload binary) -> AUDIO_FEATURES_SCHEMA via mapInPandas:
    duration/sample-rate metadata plus a 64-bit loudness-envelope
    fingerprint (the audio analog of phash — near-dup audio detection
    joins on it exactly like the LSH band tables).

    Real deployment: swap _fake_decode for soundfile/ffmpeg inside the
    same batch kernel; the Spark plan is identical."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio decoding requires soundfile/ffmpeg (not in this "
                    "container); pass fake=True for the deterministic stub"
                )
            rows = []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(b"audio:" + data).digest()
                sample_rate = (8000, 16000, 22050, 44100)[digest[0] % 4]
                duration = round(0.5 + digest[1] / 8.0, 3)
                _, _, env = _fake_decode(b"env:" + data)
                rows.append(
                    {
                        "url": url,
                        "n_bytes": len(data),
                        "duration_s": duration,
                        "sample_rate": sample_rate,
                        "loudness_fp": _phash64(env),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "n_bytes", "duration_s", "sample_rate",
                    "loudness_fp",
                ],
            )

    return df.select(url_col, payload_col).mapInPandas(
        kernel, schema=AUDIO_FEATURES_SCHEMA
    )


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
    url_col: str = "url",
    fake: bool = False,
) -> DataFrame:
    """Binary-in/binary-out transform: (url, payload) -> RESIZED_SCHEMA
    with the payload re-encoded at (target_w, target_h). The shape that
    matters at 100 TB: the output stays an opaque binary column (never a
    driver round-trip), written straight back to a table partition-
    aligned with the input scan — mapInPandas preserves partitioning, so
    no shuffle anywhere."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resizing requires PIL/libvips (not in this "
                    "container); pass fake=True for the deterministic stub"
                )
            rows = []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                # deterministic fake re-encode: content-derived bytes sized
                # proportionally to the target area
                digest = hashlib.sha256(
                    data + target_w.to_bytes(4, "big")
                    + target_h.to_bytes(4, "big")
                ).digest()
                out_len = max(16, (target_w * target_h) // 64)
                body = (digest * (out_len // len(digest) + 1))[:out_len]
                rows.append(
                    {
                        "url": url,
                        "width": target_w,
                        "height": target_h,
                        "payload": body,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["url", "width", "height", "payload"]
            )

    return df.select(url_col, payload_col).mapInPandas(
        kernel, schema=RESIZED_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    every_nth: int = 10,
    n_frames: int = 4,
    payload_col: str = "payload",
    url_col: str = "url",
    fake: bool = False,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (fan-out
    inside mapInPandas — the batch shape a real ffmpeg kernel would use)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decoding requires ffmpeg (not in this container);"
                    " pass fake=True for the deterministic stub"
                )
            rows = []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                for i in range(n_frames):
                    frame_seed = data + i.to_bytes(4, "big") + bytes(every_nth)
                    _, _, gray = _fake_decode(frame_seed)
                    rows.append(
                        {
                            "url": url,
                            "frame_idx": i * every_nth,
                            "frame_phash": _phash64(gray),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["url", "frame_idx", "frame_phash"]
            )

    return df.select(url_col, payload_col).mapInPandas(
        kernel, schema=FRAME_SAMPLE_SCHEMA
    )
