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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from py_image_dedup_spark.config import DedupConfig
from py_image_dedup_spark.operators.exact import (
    exact_unique_representatives,
    with_content_hash,
)
from py_image_dedup_spark.operators.incremental import merge_signatures
from py_image_dedup_spark.operators.lsh import (
    explode_bands,
    variant_sig_cols,
    verify_pairs,
)
from py_image_dedup_spark.operators.modes import minhash_signatures


def _require_variant_cols(store_columns, cfg: DedupConfig) -> tuple:
    """cfg.norm_variants against an existing store's schema: the store must
    already carry every requested sig_v_<variant> column, or the stream
    would silently dedup WITHOUT the variants batch mode catches (ADVICE
    r5) — and the first variant-batch append would leave the log with a
    mixed schema. Rebuild the store (or drop norm_variants) instead."""
    want = tuple(f"sig_v_{n}" for n in cfg.norm_variants)
    missing = [c for c in want if c not in store_columns]
    if missing:
        raise ValueError(
            f"signature store lacks variant signature columns {missing} "
            "required by cfg.norm_variants="
            f"{cfg.norm_variants}; rebuild the store with variants enabled "
            "or run without norm_variants"
        )
    return want


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
    vcols = _require_variant_cols(signature_store.columns, cfg)
    new_sigs = minhash_signatures(reps, cfg).select(
        "url", "content_hash", "sig", *vcols
    )

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
    verified = verify_pairs(pairs, store, cfg, sig_cols=("sig", *vcols))
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


def latest_signatures(sig_log: DataFrame) -> DataFrame:
    """Current view of the append-only signature log: latest batch wins per
    url. The parquet stand-in for an Iceberg MERGE'd table — on a cluster
    the log+compaction pair becomes `MERGE INTO signatures USING updates ON
    url` and this view is just the table scan."""
    payload = [c for c in sig_log.columns if c not in ("url", "batch_id")]
    return (
        sig_log.groupBy("url")
        .agg(
            F.max_by(F.struct(*payload), F.col("batch_id")).alias("_r"),
            F.max("batch_id").alias("batch_id"),
        )
        .select("url", *[F.col(f"_r.{c}").alias(c) for c in payload], "batch_id")
    )


def compact_band_store(
    spark: SparkSession, store_path: str, n_band_partitions: int = 64
) -> dict:
    """Maintenance job bounding the append-only store's read amplification:
    rewrite `sigs` keeping only the latest row per url, and `bands` keeping
    only rows whose (url, batch_id) is still current — the rows every
    future micro-batch's superseded-filter would discard at read time
    anyway (run_incremental_stream's left_semi on latest_signatures). After
    compaction each scan reads O(live) bytes no matter how many re-upsert
    batches a long-running daemon has appended.

    MUST NOT run concurrently with an active micro-batch (call it while
    the StreamingQuery is stopped, or from a maintenance window between
    triggers): the swap is a directory rename, not a transaction. On a
    cluster this whole function is Iceberg `rewrite_data_files` /
    `expire_snapshots` and the caveat disappears. Returns per-table
    before/after row counts.
    """
    import shutil

    sig_path = os.path.join(store_path, "sigs")
    bands_path = os.path.join(store_path, "bands")
    sig_log = spark.read.parquet(sig_path)
    current = latest_signatures(sig_log)
    stats = {"sigs_before": sig_log.count()}

    # Write EVERY compacted table to a tmp dir before swapping ANY source
    # dir: a DataFrame's file index is captured at read time, so swapping
    # `sigs` first would leave the bands join scanning deleted files.
    sig_tmp = sig_path + "__compact_tmp"
    current.select(*sig_log.columns).write.mode("overwrite").parquet(sig_tmp)
    # re-read from the stable tmp copy for the bands join
    current_c = spark.read.parquet(sig_tmp)

    def _swap(tmp, path):
        old = path + "__compact_old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)

    bands_tmp = None
    if os.path.exists(bands_path):
        bands = spark.read.parquet(bands_path)
        stats["bands_before"] = bands.count()
        live = bands.join(
            current_c.select("url", "batch_id"), ["url", "batch_id"],
            "left_semi",
        )
        bands_tmp = bands_path + "__compact_tmp"
        (
            live.select("url", "band_id", "band_hash", "batch_id", "band_pfx")
            .write.mode("overwrite")
            .partitionBy("band_pfx")
            .parquet(bands_tmp)
        )

    _swap(sig_tmp, sig_path)
    stats["sigs_after"] = spark.read.parquet(sig_path).count()
    if bands_tmp is not None:
        _swap(bands_tmp, bands_path)
        stats["bands_after"] = spark.read.parquet(bands_path).count()
    return stats


def attach_metrics_listener(spark: SparkSession, metrics_path: str):
    """Per-micro-batch observability — the daemon analog of the reference's
    live Prometheus summaries (py_image_dedup/stats.py:18-20, scraped over
    HTTP while the daemon runs; cli.py:75-78): one parquet metrics row per
    completed micro-batch, visible within ~a flush interval of the batch
    finishing, not at job end.

    Listener-bus hygiene (ADVICE r3): onQueryProgress only ENQUEUES the
    row — no Spark job ever runs on the listener-bus thread (a blocking
    write there backs up / drops listener events). A daemon flusher
    thread drains the queue and writes BATCHED parquet appends, so a fast
    trigger cadence coalesces many micro-batches into one file instead of
    one tiny file each. Only queries started after attach are recorded
    (not every query in the session), and when the last of them
    terminates the flusher drains, DETACHES the listener, and exits.

    Schema: (query_id, batch_id, ts, input_rows, rows_per_sec,
    trigger_ms). Returns the listener (spark.streams.removeListener
    detaches early; termination detaches automatically)."""
    import queue as _queue
    import threading

    from pyspark.sql.streaming import StreamingQueryListener

    _SCHEMA = (
        "query_id string, batch_id long, ts string, "
        "input_rows long, rows_per_sec double, trigger_ms double"
    )

    class _BatchMetrics(StreamingQueryListener):
        def __init__(self):
            self._q: _queue.Queue = _queue.Queue()
            self._ids: set[str] = set()
            self._live = 0
            self._lock = threading.Lock()
            self._stop = threading.Event()
            self._thread = threading.Thread(
                target=self._flush_loop, daemon=True,
                name="dedup-metrics-flusher",
            )
            self._thread.start()

        # -- listener-bus callbacks: O(1), never touch Spark -------------
        def onQueryStarted(self, event):
            with self._lock:
                self._ids.add(str(event.id))
                self._live += 1

        def onQueryProgress(self, event):
            p = event.progress
            if str(p.id) not in self._ids:
                return  # not one of ours — don't record the whole session
            self._q.put((
                str(p.id),
                int(p.batchId),
                str(p.timestamp),
                int(p.numInputRows),
                float(p.processedRowsPerSecond or 0.0),
                float((p.durationMs or {}).get("triggerExecution", 0)),
            ))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            with self._lock:
                if str(event.id) in self._ids:
                    self._live -= 1
                    if self._live <= 0:
                        self._stop.set()  # flusher drains + detaches

        # -- flusher thread ----------------------------------------------
        def _flush_loop(self):
            failures = 0
            while True:
                stopping = self._stop.is_set()
                rows = []
                try:
                    rows.append(self._q.get(timeout=0.5))
                except _queue.Empty:
                    pass
                while True:
                    try:
                        rows.append(self._q.get_nowait())
                    except _queue.Empty:
                        break
                if rows:
                    try:
                        spark.createDataFrame(rows, _SCHEMA).coalesce(
                            1
                        ).write.mode("append").parquet(metrics_path)
                        failures = 0
                    except Exception:  # session stopping / path gone
                        failures += 1
                        if failures >= 3:
                            return
                if stopping and self._q.empty():
                    try:
                        spark.streams.removeListener(self)
                    except Exception:
                        pass
                    return

    listener = _BatchMetrics()
    spark.streams.addListener(listener)
    return listener


def run_incremental_stream(
    spark: SparkSession,
    input_path: str,
    store_path: str,
    pairs_path: str,
    cfg: DedupConfig,
    trigger_seconds: int = 30,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
    n_band_partitions: int = 64,
    metrics_path: str | None = None,
    schema: str = "url string, warc_ts timestamp, html binary, "
                  "text string, lang string",
):
    """Wire incremental dedup to a file-source stream (new parquet files
    under input_path = the watchdog watch dir). Returns the StreamingQuery.

    Storage layout — all APPEND-only, so no micro-batch ever deletes files
    another plan still references, and per-batch write cost is O(batch):

      store_path/sigs    (url, content_hash, sig, batch_id) signature LOG;
                         current view = latest_signatures() (latest batch
                         wins per url — the upsert/S7 semantics)
      store_path/bands   (url, band_id, band_hash, batch_id) partitioned
                         by band_pfx = pmod(band_hash, n_band_partitions):
                         the per-batch "which stored docs share a bucket
                         with the new docs" lookup reads ONLY the
                         partitions holding touched buckets (partition
                         pruning at scan time), not the whole store
      pairs_path         verified pairs, appended per batch

    Each pair is emitted exactly once across batches (a pair needs >=1 new
    side; re-upserting a url re-emits its pairs — downstream dedupes on
    (url_a, url_b), same as re-running find_duplicates in the reference
    daemon, processing_manager.py:100-136).
    """
    sig_path = os.path.join(store_path, "sigs")
    bands_path = os.path.join(store_path, "bands")

    if metrics_path is not None:
        attach_metrics_listener(spark, metrics_path)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def process(batch: DataFrame, batch_id: int) -> None:
        # T6 queue-dedupe, per drained batch (processing_manager.py:65-69):
        # one row per url, latest warc_ts wins
        cols = [c for c in batch.columns if c != "url"]
        batch = (
            batch.groupBy("url")
            .agg(F.max_by(F.struct(*cols), F.col("warc_ts")).alias("_r"))
            .select("url", *[F.col(f"_r.{c}").alias(c) for c in cols])
        )
        hashed = with_content_hash(batch)
        reps = exact_unique_representatives(hashed)
        vcols = tuple(f"sig_v_{n}" for n in cfg.norm_variants)
        new_sigs = (
            minhash_signatures(reps, cfg)
            .select("url", "content_hash", "sig", *vcols)
            .withColumn("batch_id", F.lit(batch_id))
            .localCheckpoint(eager=True)  # hash once, 4 consumers below
        )
        if new_sigs.isEmpty():
            return
        new_bands = explode_bands(new_sigs, cfg).withColumn(
            "batch_id", F.lit(batch_id)
        )
        touched = new_bands.select("band_id", "band_hash").distinct()
        touched_pfx = [
            r[0]
            for r in touched.select(
                F.pmod("band_hash", F.lit(n_band_partitions)).alias("p")
            )
            .distinct()
            .collect()
        ]

        band_cols = ["url", "band_id", "band_hash"]
        all_bands = new_bands.select(*band_cols)
        store_sigs = None
        if os.path.exists(os.path.join(sig_path, "_SUCCESS")):
            sig_log = spark.read.parquet(sig_path)
            # fail BEFORE this batch appends a mixed-schema file to the log
            _require_variant_cols(sig_log.columns, cfg)
            store_sigs = latest_signatures(sig_log)
            # partition-pruned scan: only band_pfx partitions that contain a
            # touched bucket are read, then exact bucket keys semi-join
            old_bands = (
                spark.read.parquet(bands_path)
                .where(F.col("band_pfx").isin(touched_pfx))
                .join(F.broadcast(touched), ["band_id", "band_hash"], "left_semi")
                # drop rows superseded by a later re-upsert of the same url
                .join(
                    store_sigs.select("url", "batch_id"),
                    ["url", "batch_id"],
                    "left_semi",
                )
            )
            all_bands = all_bands.unionByName(old_bands.select(*band_cols))

        new_urls = new_sigs.select("url")
        mark_a = F.broadcast(
            new_urls.select(F.col("url").alias("url_a"), F.lit(1).alias("_na"))
        )
        mark_b = F.broadcast(
            new_urls.select(F.col("url").alias("url_b"), F.lit(1).alias("_nb"))
        )
        a, b = all_bands.alias("a"), all_bands.alias("b")
        pairs = (
            a.join(b, ["band_id", "band_hash"])
            .where(F.col("a.url") < F.col("b.url"))
            .select(F.col("a.url").alias("url_a"), F.col("b.url").alias("url_b"))
            .join(mark_a, "url_a", "left")
            .join(mark_b, "url_b", "left")
            # >=1 side new; old-vs-old pairs were emitted by earlier batches
            .where(F.col("_na").isNotNull() | F.col("_nb").isNotNull())
            .groupBy("url_a", "url_b")
            .agg(F.count("*").cast("double").alias("score"))
        )
        sigs_view = new_sigs.select("url", "content_hash", "sig", *vcols)
        if store_sigs is not None:
            sigs_view = merge_signatures(
                store_sigs.select("url", "content_hash", "sig", *vcols),
                sigs_view,
            )
        verified = verify_pairs(pairs, sigs_view, cfg,
                                sig_cols=("sig", *vcols))

        # appends only — nothing a concurrent or later plan reads is deleted
        verified.write.mode("append").parquet(pairs_path)
        new_sigs.write.mode("append").parquet(sig_path)
        # Pruning-selectivity metric (VERDICT r4 item 6): the T7 path's
        # 100x-scale assumption is touched buckets << store, i.e. the
        # band-store scan reads only the band_pfx partitions a new batch
        # touches. Record scanned-vs-total partitions per micro-batch so
        # that selectivity is OBSERVABLE (touched == total on a batch means
        # the store scan degenerated to a full read — resize
        # n_band_partitions). Cheap by construction: touched_pfx is already
        # collected for the pruned scan; total is the layout constant.
        spark.createDataFrame(
            [(batch_id, len(touched_pfx), n_band_partitions,
              store_sigs is not None)],
            "batch_id long, touched_band_partitions int, "
            "total_band_partitions int, store_scanned boolean",
        ).write.mode("append").parquet(os.path.join(store_path, "scan_metrics"))
        (
            new_bands.withColumn(
                "band_pfx", F.pmod("band_hash", F.lit(n_band_partitions))
            )
            .write.mode("append")
            .partitionBy("band_pfx")
            .parquet(bands_path)
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", store_path + "_ckpt"
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
