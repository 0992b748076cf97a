"""Action application (S12 analog) + HTML head metadata extraction (P2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_image_dedup_spark.config import DedupConfig
from py_image_dedup_spark.functions.normalize import extract_meta_udf
from py_image_dedup_spark.operators.apply import (
    action_summary,
    apply_actions,
    keepers,
    split_actions,
)
from py_image_dedup_spark.plans.pipeline import run_dedup_pipeline
from py_image_dedup_spark.sources.pages import generate_pages


def test_split_and_apply_actions(spark, tmp_path):
    pages = generate_pages(spark, 10, seed=11).cache()
    out = run_dedup_pipeline(
        spark, pages, DedupConfig(max_dist=0.30), str(tmp_path / "ck"),
        resume=False,
    )
    actions = out["actions"]
    kept, removed = split_actions(pages, actions)
    assert kept.count() == actions.where("action = 'keep'").count()
    assert removed.count() == actions.where("action = 'delete'").count()
    # kept + removed partition pages exactly
    assert kept.count() + removed.count() == pages.count()
    # originals are never removed (removed carries the pages columns)
    assert removed.where("variant = 'original'").count() == 0

    res = apply_actions(
        pages, actions,
        kept_path=str(tmp_path / "kept"),
        quarantine_path=str(tmp_path / "quar"),
    )
    assert spark.read.parquet(str(tmp_path / "kept")).count() == kept.count()
    assert spark.read.parquet(str(tmp_path / "quar")).count() == removed.count()

    # dry-run writes nothing
    apply_actions(pages, actions, kept_path=str(tmp_path / "nope"),
                  dry_run=True)
    import os

    assert not os.path.exists(str(tmp_path / "nope"))

    summary = {
        r["action"]: (r["n"], r["total_bytes"])
        for r in action_summary(actions, out["pages_meta"]).collect()
    }
    assert summary["keep"][0] == kept.count()
    assert summary["delete"][1] > 0
    assert keepers(actions).count() == kept.count()


def test_extract_meta(spark):
    html = (
        b'<html><head><meta charset="utf-8"><title>My Page</title>'
        b'<meta name="author" content="someone">'
        b'<meta property="og:type" content="article">'
        b"</head><body>hi</body></html>"
    )
    df = spark.createDataFrame(
        [("u1", html), ("u2", b"not html at all"), ("u3", None)],
        "url string, html binary",
    )
    got = {
        r["url"]: r["m"]
        for r in df.select("url", extract_meta_udf("html").alias("m")).collect()
    }
    assert got["u1"]["title"] == "My Page"
    assert got["u1"]["charset"] == "utf-8"
    assert got["u1"]["author"] == "someone"
    assert got["u1"]["og:type"] == "article"
    assert got["u2"] == {}
    assert got["u3"] == {}


def test_meta_feeds_policy_rules(spark):
    """more-meta rule: richer head metadata wins (exif analog)."""
    import datetime

    from py_image_dedup_spark.operators.select import select_keepers

    rows = [
        ("rich", 0.0, 100, datetime.datetime(1970, 1, 1), 10,
         {"a": "1", "b": "2"}, 0.0, "c1"),
        ("poor", 0.0, 100, datetime.datetime(1970, 1, 1), 10, {}, 0.0, "c1"),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, dist double, n_bytes long, warc_ts timestamp, "
        "n_chars long, meta map<string,string>, score double, cluster_id string",
    )
    cfg = DedupConfig(prioritization_rules=("more-meta",))
    got = {r["url"]: r["action"] for r in select_keepers(df, cfg).collect()}
    assert got == {"rich": "keep", "poor": "delete"}
