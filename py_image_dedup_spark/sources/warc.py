"""WARC source — read Common-Crawl-style web archive files into the
`pages` schema (url, warc_ts, html).

The reference walks a directory of image files
(py_image_dedup/library/deduplicator.py:176-214 via FileObserver); the
web-text analog ingests WARC files, the container format Common Crawl
ships. Pure-stdlib parsing (WARC framing is plain RFC-style headers;
.warc.gz is a sequence of independent gzip members, which
zlib.decompressobj(wbits=31) walks via unused_data — no external
libraries).

Spark shape: `spark.read.format("binaryFile")` yields one row per file
(path, modificationTime, length, content); a mapInPandas kernel explodes
each file into its response records. One WARC file = one task — exactly
how Common Crawl's own Spark tooling processes the corpus (files are
~1 GB, sized for a single executor core; at 100 TB the parallelism unit
is the file, already 80k+ tasks, so no intra-file split is needed).
Chain `functions/normalize.extract_text_udf` downstream for the text
column; this source stays extraction-agnostic.
"""

from __future__ import annotations

import io
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_PAGES_SCHEMA = "url string, warc_ts string, html binary"

GZIP_MAGIC = b"\x1f\x8b"


def gunzip_members(data: bytes) -> bytes:
    """Concatenated gzip members (the .warc.gz layout: one member per
    record) -> the concatenated plain bytes."""
    out = io.BytesIO()
    rest = data
    while rest[:2] == GZIP_MAGIC:
        d = zlib.decompressobj(wbits=31)
        out.write(d.decompress(rest))
        out.write(d.flush())
        rest = d.unused_data
    return out.getvalue()


def _http_body(payload: bytes) -> bytes:
    """HTTP response payload -> body (headers stripped). Tolerates bare
    bodies (no status line) and \\n-only header framing."""
    if not payload[:5] in (b"HTTP/",):
        return payload
    for sep in (b"\r\n\r\n", b"\n\n"):
        idx = payload.find(sep)
        if idx != -1:
            return payload[idx + len(sep):]
    return b""


def _resync(data: bytes, pos: int) -> int:
    """Position of the next `WARC/` record boundary at/after `pos` (start
    of a line), or len(data). Lets one torn record cost one record, not
    the rest of the file."""
    if data[pos : pos + 5] == b"WARC/":
        return pos  # already at a boundary (e.g. right after a torn header)
    nxt = data.find(b"\nWARC/", pos)
    return nxt + 1 if nxt != -1 else len(data)


def parse_warc(data: bytes, stats: dict | None = None) -> Iterator[dict]:
    """WARC bytes (plain or .gz) -> dicts (url, warc_ts, html) for every
    response record. Record framing per ISO 28500: version line, header
    lines to a blank line, Content-Length payload bytes, blank separator.
    Non-response records (warcinfo/request/metadata) are skipped. Records
    with unparsable headers are skipped, not fatal (a 100 TB crawl always
    contains a few torn records): the parser RESYNCS at the next line
    starting `WARC/` — one torn record near the head of a ~1 GB file must
    not silently discard the tail (ADVICE r3). `stats`, if given,
    receives {"resyncs": n} so truncated ingest is observable."""
    if data[:2] == GZIP_MAGIC:
        data = gunzip_members(data)
    pos, n = 0, len(data)
    resyncs = 0
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        if pos >= n:
            break
        if not data[pos : pos + 5] == b"WARC/":
            resyncs += 1
            pos = _resync(data, pos)
            continue
        hdr_end = data.find(b"\r\n\r\n", pos)
        sep_len = 4
        if hdr_end == -1:
            hdr_end = data.find(b"\n\n", pos)
            sep_len = 2
        if hdr_end == -1:
            resyncs += 1  # torn header block at EOF — nothing to frame
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(b"\n")[1:]:
            line = line.strip(b"\r")
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            # cannot frame this payload — drop THIS record, resync at the
            # next boundary (payload bytes containing "\nWARC/" can cost a
            # false resync of at most the one following record)
            resyncs += 1
            pos = _resync(data, hdr_end + sep_len)
            continue
        body_start = hdr_end + sep_len
        payload = data[body_start : body_start + length]
        pos = body_start + length
        if headers.get("warc-type") == "response":
            url = headers.get("warc-target-uri")
            if url:
                yield {
                    "url": url,
                    "warc_ts": headers.get("warc-date", ""),
                    "html": _http_body(payload),
                }
    if stats is not None:
        stats["resyncs"] = resyncs


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files under `path` -> (url, warc_ts timestamp, html binary).

    binaryFile scan (one row/file) -> mapInPandas record explode. The
    kernel is Arrow-batched over files, pure Python only inside each
    file's byte parse — the same batch-kernel pattern as the multimodal
    codecs (operators/multimodal.py)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(parse_warc(bytes(content)))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html"]
            )

    raw = spark.read.format("binaryFile").load(path).select("content")
    pages = raw.mapInPandas(kernel, schema=WARC_PAGES_SCHEMA)
    return pages.withColumn(
        "warc_ts", F.to_timestamp("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")
    )
