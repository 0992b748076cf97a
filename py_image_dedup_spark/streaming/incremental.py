"""Daemon-mode analog: Structured Streaming incremental dedup.

The reference's daemon (SURVEY.md §2.7) is: watchdog events -> debounced
queue (30 s settle) -> per-item re-analysis + re-dedup
(py_image_dedup/processing_manager.py:19-136). The Spark-native analog:

  readStream (new page files / Iceberg appends)
    -> dropDuplicates on url within batch   (T6, OrderedDict dedupe)
    -> foreachBatch incremental_batch        (T7, re-analyze + re-dedup)
  trigger(processingTime=...)                (T5, RegularIntervalWorker)

The debounce/settle window (T4, processing_manager.py:76-80) maps to the
processing-time trigger interval; exact event-time parity would use
session_window(ts, '30 seconds') which is provided by session_windows()
for event tables.

incremental_batch is deliberately *restricted re-dedup*: new signatures are
merged into the store, then the LSH join runs only for bands touched by
the new docs — the micro-batch analog of the reference re-running
find_duplicates for just the drained queue items
(processing_manager.py:100-136).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from py_image_dedup_spark.config import DedupConfig
from py_image_dedup_spark.operators.exact import (
    exact_unique_representatives,
    with_content_hash,
)
from py_image_dedup_spark.operators.incremental import merge_signatures
from py_image_dedup_spark.operators.lsh import (
    compute_signatures,
    explode_bands,
    verify_pairs,
)


def incremental_pairs(
    new_pages: DataFrame,
    signature_store: DataFrame,
    cfg: DedupConfig,
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch step: returns (updated_store, new_verified_pairs).

    Only buckets containing >=1 NEW document generate pairs — existing-vs-
    existing pairs were already emitted by earlier batches. This is the
    band-restricted re-query of processing_manager.py:100-136, expressed as
    a semi-join of the store's bands against the new docs' band keys.
    """
    hashed = with_content_hash(new_pages)
    reps = exact_unique_representatives(hashed)
    new_sigs = compute_signatures(reps, cfg).select("url", "content_hash", "sig")

    store = merge_signatures(signature_store, new_sigs)

    new_bands = explode_bands(new_sigs, cfg)
    touched = new_bands.select("band_id", "band_hash").distinct()
    store_bands = explode_bands(store, cfg).join(
        F.broadcast(touched), ["band_id", "band_hash"], "left_semi"
    )
    a, b = store_bands.alias("a"), store_bands.alias("b")
    new_urls = new_sigs.select("url")
    mark_a = F.broadcast(
        new_urls.select(F.col("url").alias("url_a"), F.lit(1).alias("_na"))
    )
    mark_b = F.broadcast(
        new_urls.select(F.col("url").alias("url_b"), F.lit(1).alias("_nb"))
    )
    pairs = (
        a.join(b, ["band_id", "band_hash"])
        .where(F.col("a.url") < F.col("b.url"))
        .select(F.col("a.url").alias("url_a"), F.col("b.url").alias("url_b"))
        .join(mark_a, "url_a", "left")
        .join(mark_b, "url_b", "left")
        # at least one side must be new; old-vs-old already emitted earlier
        .where(F.col("_na").isNotNull() | F.col("_nb").isNotNull())
        .groupBy("url_a", "url_b")
        .agg(F.count("*").cast("double").alias("score"))
    )
    verified = verify_pairs(pairs, store, cfg)
    return store, verified


def filter_events(
    events: DataFrame,
    url_prefixes: tuple[str, ...] = (),
    exclude_pattern: str | None = None,
    lang_allow: tuple[str, ...] = (),
) -> DataFrame:
    """T2 (file_watch.py:60-66): keep only events whose url is under a
    watched root, doesn't match the exclusion regex, and passes the
    lang allow-list (extension-filter analog)."""
    out = events
    if url_prefixes:
        cond = None
        for p in url_prefixes:
            c = F.col("url").startswith(p)
            cond = c if cond is None else (cond | c)
        out = out.where(cond)
    if exclude_pattern:
        out = out.where(~F.col("url").rlike(exclude_pattern))
    if lang_allow:
        out = out.where(F.col("lang").isin(*lang_allow))
    return out


def route_events(events: DataFrame) -> dict[str, DataFrame]:
    """T3 (file_watch.py:23-58): CDC routing by event kind.

    created/modified -> upsert; moved -> delete old url + upsert new;
    deleted -> remove. Input: (kind, url, new_url?, ...payload). Returns
    {"upserts": urls to (re)analyze, "deletes": urls to drop from store}.
    """
    cols = [c for c in events.columns if c not in ("kind", "new_url")]
    upserts = events.where(
        F.col("kind").isin("created", "modified")
    ).select(*cols)
    if "new_url" in events.columns:
        moved = events.where(F.col("kind") == "moved")
        upserts = upserts.unionByName(
            moved.select(
                F.col("new_url").alias("url"),
                *[c for c in cols if c != "url"],
            )
        )
        move_deletes = moved.select("url")
    else:
        move_deletes = events.limit(0).select("url")
    deletes = (
        events.where(F.col("kind") == "deleted").select("url")
        .unionByName(move_deletes)
        .distinct()
    )
    return {"upserts": upserts, "deletes": deletes}


def session_windows(events: DataFrame, gap: str = "30 seconds") -> DataFrame:
    """Event-time settle window (T4 exact parity): one row per
    (key, session_window) with the event count."""
    return (
        events.groupBy(F.session_window(F.col("ts"), gap), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def run_incremental_stream(
    spark: SparkSession,
    input_path: str,
    store_path: str,
    pairs_path: str,
    cfg: DedupConfig,
    trigger_seconds: int = 30,
    schema: str = "url string, warc_ts timestamp, html binary, "
                  "text string, lang string",
):
    """Wire the micro-batch step to a file-source stream (new parquet files
    under input_path = the watchdog watch dir). Returns the StreamingQuery.
    """
    stream = (
        spark.readStream.schema(schema).parquet(input_path)
        .dropDuplicates(["url"])
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        try:
            store = spark.read.parquet(store_path)
        except Exception:  # first batch: empty store
            store = spark.createDataFrame(
                [], "url string, content_hash string, sig array<long>"
            )
        new_store, verified = incremental_pairs(batch, store, cfg)
        new_store.write.mode("overwrite").parquet(store_path + "_next")
        spark.read.parquet(store_path + "_next").write.mode("overwrite").parquet(store_path)
        verified.write.mode("append").parquet(pairs_path)

    return (
        stream.writeStream.foreachBatch(process)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .option("checkpointLocation", store_path + "_ckpt")
        .start()
    )
