"""Event filter / routing (T2, T3) + duplicate-row repair (P10)."""

from __future__ import annotations

from py_image_dedup_spark.operators.incremental import repair_duplicate_rows
from py_image_dedup_spark.streaming.incremental import filter_events, route_events

EV = "kind string, url string, new_url string, lang string"


def test_filter_events(spark):
    rows = [
        ("created", "https://a.example/x", None, "en"),
        ("created", "https://b.example/y", None, "en"),   # wrong root
        ("created", "https://a.example/tmp/z", None, "en"),  # excluded
        ("created", "https://a.example/w", None, "zz"),   # wrong lang
    ]
    ev = spark.createDataFrame(rows, EV)
    got = filter_events(
        ev,
        url_prefixes=("https://a.example/",),
        exclude_pattern=r"/tmp/",
        lang_allow=("en", "de"),
    )
    assert [r["url"] for r in got.collect()] == ["https://a.example/x"]


def test_route_events(spark):
    rows = [
        ("created", "u1", None, "en"),
        ("modified", "u2", None, "en"),
        ("moved", "u3", "u3b", "en"),
        ("deleted", "u4", None, "en"),
    ]
    ev = spark.createDataFrame(rows, EV)
    routed = route_events(ev)
    ups = {r["url"] for r in routed["upserts"].collect()}
    dels = {r["url"] for r in routed["deletes"].collect()}
    assert ups == {"u1", "u2", "u3b"}
    assert dels == {"u3", "u4"}


def test_repair_duplicate_rows(spark):
    rows = [
        ("u1", "h1", [1, 2]),
        ("u1", "h0", [9]),  # duplicate url -> keep smallest (h0 first)
        ("u2", "h2", [3]),
    ]
    df = spark.createDataFrame(
        rows, "url string, content_hash string, sig array<int>"
    )
    got = {
        r["url"]: r["content_hash"]
        for r in repair_duplicate_rows(df).collect()
    }
    assert got == {"u1": "h0", "u2": "h2"}
