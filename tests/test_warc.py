"""WARC source (sources/warc.py): framing, gzip members, Spark ingestion."""

from __future__ import annotations

import gzip
import os

from py_image_dedup_spark.sources.warc import parse_warc, read_warc


def _record(wtype: str, url: str | None, date: str, payload: bytes) -> bytes:
    head = [f"WARC/1.0", f"WARC-Type: {wtype}", f"WARC-Date: {date}"]
    if url:
        head.append(f"WARC-Target-URI: {url}")
    head.append(f"Content-Length: {len(payload)}")
    return ("\r\n".join(head) + "\r\n\r\n").encode() + payload + b"\r\n\r\n"


def _http(body: bytes) -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)


WARC_BYTES = (
    _record("warcinfo", None, "2026-01-01T00:00:00Z", b"software: test")
    + _record("request", "http://a.example/x", "2026-01-02T03:04:05Z",
              b"GET /x HTTP/1.1\r\n\r\n")
    + _record("response", "http://a.example/x", "2026-01-02T03:04:05Z",
              _http(b"<html><body>alpha</body></html>"))
    + _record("response", "http://b.example/y", "2026-02-03T04:05:06Z",
              _http(b"<html><body>beta</body></html>"))
)


def test_parse_plain_warc():
    recs = list(parse_warc(WARC_BYTES))
    assert [r["url"] for r in recs] == ["http://a.example/x", "http://b.example/y"]
    assert recs[0]["html"] == b"<html><body>alpha</body></html>"
    assert recs[1]["warc_ts"] == "2026-02-03T04:05:06Z"


def test_parse_gzip_members():
    # .warc.gz layout: EACH record its own gzip member, concatenated
    gz = b"".join(
        gzip.compress(_record("response", f"http://g.example/{i}",
                              "2026-01-01T00:00:00Z",
                              _http(f"<p>doc {i}</p>".encode())))
        for i in range(3)
    )
    recs = list(parse_warc(gz))
    assert [r["url"] for r in recs] == [f"http://g.example/{i}" for i in range(3)]
    assert recs[2]["html"] == b"<p>doc 2</p>"


def test_parse_tolerates_bare_payload_and_torn_tail():
    data = (
        _record("response", "http://c.example/z", "2026-01-01T00:00:00Z",
                b"no http framing at all")
        + b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: oops\r\n\r\n"
    )
    recs = list(parse_warc(data))
    assert len(recs) == 1
    assert recs[0]["html"] == b"no http framing at all"


def test_parse_resyncs_after_torn_record_near_head():
    """ADVICE r3: a torn record near the HEAD must not discard the rest of
    the file — the parser resyncs at the next WARC/ boundary and reports
    the drop via stats."""
    torn = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: oops\r\n\r\n"
    good = _record(
        "response", "http://t.example/a", "2026-01-01T00:00:00Z",
        _http(b"<p>alpha</p>"),
    ) + _record(
        "response", "http://t.example/b", "2026-01-01T00:00:01Z",
        _http(b"<p>beta</p>"),
    )
    stats: dict = {}
    recs = list(parse_warc(torn + good, stats))
    assert [r["url"] for r in recs] == [
        "http://t.example/a", "http://t.example/b"
    ]
    assert stats["resyncs"] == 1
    # leading garbage (not even a WARC header) also resyncs
    stats2: dict = {}
    recs2 = list(parse_warc(b"garbage bytes\r\n" + good, stats2))
    assert len(recs2) == 2 and stats2["resyncs"] == 1


def test_read_warc_spark(spark, tmp_path):
    p = tmp_path / "crawl"
    os.makedirs(p)
    (p / "part1.warc").write_bytes(WARC_BYTES)
    (p / "part2.warc.gz").write_bytes(
        gzip.compress(_record("response", "http://c.example/z",
                              "2026-03-04T05:06:07Z", _http(b"<i>gamma</i>")))
    )
    df = read_warc(spark, str(p)).orderBy("url")
    rows = df.collect()
    assert [r["url"] for r in rows] == [
        "http://a.example/x", "http://b.example/y", "http://c.example/z"
    ]
    assert bytes(rows[2]["html"]) == b"<i>gamma</i>"
    assert rows[0]["warc_ts"].year == 2026 and rows[0]["warc_ts"].month == 1
    assert dict(df.dtypes)["warc_ts"] == "timestamp"
