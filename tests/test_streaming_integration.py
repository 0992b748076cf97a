"""Real StreamingQuery integration test for the daemon-mode analog (T1-T7).

Exercises run_incremental_stream end-to-end: a file-source stream drained
with trigger(availableNow) in >=2 micro-batches (maxFilesPerTrigger=1),
including a re-upsert of an existing url (the reference daemon's
modified-file path, processing_manager.py:100-136). Asserts:

  * the banded store layout is written (sigs log + band_pfx partitions);
  * latest_signatures resolves the re-upserted url to its newest content;
  * streamed pair recall: every pair a full batch re-run over the final
    corpus finds is present in the appended pairs log; extra logged pairs
    may only involve the re-upserted url (historical pairs from before the
    upsert — the log keeps them, downstream dedupes).
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from py_image_dedup_spark.config import DedupConfig
from py_image_dedup_spark.sources.pages import generate_pages
from py_image_dedup_spark.streaming.incremental import (
    incremental_pairs,
    latest_signatures,
    run_incremental_stream,
)

PAGE_COLS = ["url", "warc_ts", "html", "text", "lang"]


def _write_wave(df, path: str) -> None:
    """One parquet FILE per wave (the file source counts files, and
    maxFilesPerTrigger=1 must map one wave to one micro-batch)."""
    tmp = path + "_tmpdir"
    df.select(*PAGE_COLS).coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.move(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], path)
    shutil.rmtree(tmp)


@pytest.fixture(scope="module")
def stream_run(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    input_dir, store_dir = str(root / "in"), str(root / "store")
    pairs_dir = str(root / "pairs")
    os.makedirs(input_dir)

    pages = generate_pages(spark, 12, seed=5).cache()
    wave1 = pages.where(F.col("group_id") < 6)
    wave2_base = pages.where(F.col("group_id") >= 6)

    # re-upsert: group 1's singleton url reappears in wave 2 with truncated
    # text (a singleton has no identical-text twin, so its url is always its
    # own exact-dup representative and is guaranteed to be in the store)
    reup = (
        pages.where((F.col("group_id") == 1) & (F.col("variant") == "singleton"))
        .withColumn("text", F.substring("text", 1, 400))
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 2 DAYS"))
    )
    wave2 = wave2_base.select(*PAGE_COLS).unionByName(reup.select(*PAGE_COLS))

    _write_wave(wave1, os.path.join(input_dir, "wave1.parquet"))
    _write_wave(wave2, os.path.join(input_dir, "wave2.parquet"))

    cfg = DedupConfig(max_dist=0.30)
    metrics_dir = str(root / "metrics")
    q = run_incremental_stream(
        spark, input_dir, store_dir, pairs_dir, cfg,
        available_now=True, max_files_per_trigger=1, n_band_partitions=16,
        metrics_path=metrics_dir,
    )
    assert q.awaitTermination(300), "stream did not drain in time"

    final_corpus = (
        wave1.select(*PAGE_COLS)
        .join(reup.select("url"), "url", "left_anti")
        .unionByName(wave2)
    )
    yield {
        "spark": spark,
        "cfg": cfg,
        "store_dir": store_dir,
        "pairs_dir": pairs_dir,
        "metrics_dir": metrics_dir,
        "final_corpus": final_corpus,
        "reup_url": reup.first()["url"],
    }
    pages.unpersist()


def test_stream_ran_multiple_batches_and_layout(stream_run):
    spark = stream_run["spark"]
    sig_log = spark.read.parquet(os.path.join(stream_run["store_dir"], "sigs"))
    n_batches = sig_log.select("batch_id").distinct().count()
    assert n_batches >= 2
    # banded store is physically partitioned by band_pfx
    bands_dir = os.path.join(stream_run["store_dir"], "bands")
    assert any(d.startswith("band_pfx=") for d in os.listdir(bands_dir))


def test_per_batch_metrics_rows_emitted(stream_run):
    """StreamingQueryListener observability (the reference daemon's live
    Prometheus-summary analog): one metrics row per micro-batch with the
    batch's input rows, written while the stream runs."""
    import time

    spark = stream_run["spark"]
    sig_log = spark.read.parquet(os.path.join(stream_run["store_dir"], "sigs"))
    n_batches = sig_log.select("batch_id").distinct().count()
    # listener events are delivered asynchronously; allow a short settle
    metrics = None
    for _ in range(30):
        try:
            metrics = spark.read.parquet(stream_run["metrics_dir"])
            if metrics.select("batch_id").distinct().count() >= n_batches:
                break
        except Exception:
            pass
        time.sleep(1)
    assert metrics is not None, "no metrics rows written"
    rows = {r["batch_id"]: r for r in metrics.collect()}
    assert len(rows) >= n_batches
    assert all(r["input_rows"] > 0 for r in rows.values())
    assert all(r["trigger_ms"] > 0 for r in rows.values())


def test_reupserted_url_resolves_to_latest(stream_run):
    spark = stream_run["spark"]
    sig_log = spark.read.parquet(os.path.join(stream_run["store_dir"], "sigs"))
    cur = latest_signatures(sig_log)
    url = stream_run["reup_url"]
    assert sig_log.where(F.col("url") == url).count() == 2
    row = cur.where(F.col("url") == url).collect()
    assert len(row) == 1
    old = sig_log.where(
        (F.col("url") == url) & (F.col("batch_id") != row[0]["batch_id"])
    ).first()
    assert row[0]["content_hash"] != old["content_hash"]


def test_streamed_pairs_match_batch_rerun(stream_run):
    spark, cfg = stream_run["spark"], stream_run["cfg"]
    streamed = {
        (r["url_a"], r["url_b"])
        for r in spark.read.parquet(stream_run["pairs_dir"])
        .select("url_a", "url_b")
        .distinct()
        .collect()
    }
    empty = spark.createDataFrame(
        [], "url string, content_hash string, sig array<int>"
    )
    _, rerun_pairs = incremental_pairs(stream_run["final_corpus"], empty, cfg)
    rerun = {(r["url_a"], r["url_b"]) for r in rerun_pairs.collect()}
    missing = rerun - streamed
    assert not missing, f"stream missed {len(missing)} pairs: {missing}"
    extra = streamed - rerun
    url = stream_run["reup_url"]
    assert all(url in p for p in extra), f"unexpected extra pairs: {extra}"


def test_scan_metrics_rows_emitted(stream_run):
    """Pruning-selectivity observability (VERDICT r4 item 6): one
    scan_metrics row per micro-batch recording scanned-vs-total band
    partitions. The first batch has no store yet (store_scanned=False)."""
    spark = stream_run["spark"]
    sm = spark.read.parquet(
        os.path.join(stream_run["store_dir"], "scan_metrics")
    )
    rows = {r["batch_id"]: r for r in sm.collect()}
    assert len(rows) >= 2
    assert all(r["total_band_partitions"] == 16 for r in rows.values())
    assert all(
        0 < r["touched_band_partitions"] <= r["total_band_partitions"]
        for r in rows.values()
    )
    first = rows[min(rows)]
    assert not first["store_scanned"]
    assert any(r["store_scanned"] for r in rows.values())


def test_store_scan_pruning_engages_on_small_batch(spark, tmp_path):
    """A single-doc update against a wide store must NOT read the whole
    band store: one doc carries at most lsh_bands distinct buckets, so with
    n_band_partitions > lsh_bands the pruned scan touches a strict subset
    of the partitions — the T7 100x-scale assumption, now asserted."""
    input_dir = str(tmp_path / "in")
    store_dir = str(tmp_path / "store")
    pairs_dir = str(tmp_path / "pairs")
    os.makedirs(input_dir)

    pages = generate_pages(spark, 10, seed=9)
    wave1 = pages.where(F.col("group_id") < 9)
    wave2 = pages.where(
        (F.col("group_id") == 9) & (F.col("variant") == "singleton")
    ).limit(1)
    _write_wave(wave1, os.path.join(input_dir, "wave1.parquet"))
    _write_wave(wave2, os.path.join(input_dir, "wave2.parquet"))

    cfg = DedupConfig(max_dist=0.30)
    q = run_incremental_stream(
        spark, input_dir, store_dir, pairs_dir, cfg,
        available_now=True, max_files_per_trigger=1, n_band_partitions=64,
    )
    assert q.awaitTermination(300), "stream did not drain in time"

    sm = spark.read.parquet(os.path.join(store_dir, "scan_metrics"))
    rows = {r["batch_id"]: r for r in sm.collect()}
    small = rows[max(rows)]
    assert small["store_scanned"]
    assert small["touched_band_partitions"] <= cfg.lsh_bands
    assert small["touched_band_partitions"] < small["total_band_partitions"], (
        "small-batch store scan read every band partition — pruning "
        "did not engage"
    )


def test_compact_band_store_drops_superseded_rows(stream_run):
    """Compaction (the Iceberg rewrite_data_files analog) keeps the current
    view bit-identical while physically dropping every superseded row the
    read-side filter was discarding per scan. MUST run last in this module:
    it rewrites the store in place."""
    from py_image_dedup_spark.streaming.incremental import compact_band_store

    spark = stream_run["spark"]
    store = stream_run["store_dir"]
    url = stream_run["reup_url"]
    sig_log = spark.read.parquet(os.path.join(store, "sigs"))
    before_current = {
        (r["url"], r["content_hash"], r["batch_id"])
        for r in latest_signatures(sig_log).collect()
    }
    old_batch = (
        sig_log.where(F.col("url") == url)
        .agg(F.min("batch_id"))
        .first()[0]
    )
    bands = spark.read.parquet(os.path.join(store, "bands"))
    assert bands.where(
        (F.col("url") == url) & (F.col("batch_id") == old_batch)
    ).count() > 0, "precondition: superseded band rows exist"

    stats = compact_band_store(spark, store)
    assert stats["sigs_after"] < stats["sigs_before"]
    assert stats["bands_after"] < stats["bands_before"]

    sig_log2 = spark.read.parquet(os.path.join(store, "sigs"))
    # exactly one row per url now, and the current view is unchanged
    assert sig_log2.count() == sig_log2.select("url").distinct().count()
    after_current = {
        (r["url"], r["content_hash"], r["batch_id"])
        for r in latest_signatures(sig_log2).collect()
    }
    assert after_current == before_current
    bands2 = spark.read.parquet(os.path.join(store, "bands"))
    assert bands2.where(
        (F.col("url") == url) & (F.col("batch_id") == old_batch)
    ).count() == 0
    # physical layout preserved: still band_pfx-partitioned for pruning
    assert any(
        d.startswith("band_pfx=")
        for d in os.listdir(os.path.join(store, "bands"))
    )
