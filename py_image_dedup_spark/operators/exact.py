"""Exact deduplication: content-hash groupBy → keep-best-copy.

The minimum end-to-end slice (SURVEY.md §7 step 2) and, at web scale, the
mandatory pre-pass before MinHash/LSH: identical-text mass (mirrors,
re-crawls) would otherwise form degenerate mega-buckets in every LSH band
(SURVEY.md §7 risk 3).

All JVM-side built-ins: sha2 for the content key, one shuffle for the
window. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_image_dedup_spark.config import DedupConfig
from py_image_dedup_spark.functions.normalize import normalize_text
from py_image_dedup_spark.operators.select import select_keepers


def with_content_hash(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds content_hash = sha256 of the *canonically normalized* text, plus
    the derived quality columns the policy needs."""
    norm = normalize_text(text_col)
    return (
        pages.withColumn("norm_text", norm)
        .withColumn("content_hash", F.sha2(F.col("norm_text"), 256))
        .withColumn("n_bytes", F.octet_length(F.col(text_col)).cast("long"))
        .withColumn("n_chars", F.length(F.col("norm_text")).cast("long"))
    )


def exact_duplicate_actions(pages: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Full exact-dedup slice: hash → group (cluster_id = content_hash) →
    policy selection → actions table (url, cluster_id, rank, keep_url,
    action)."""
    hashed = with_content_hash(pages)
    candidates = hashed.select(
        "url",
        F.col("content_hash").alias("cluster_id"),
        F.lit(0.0).alias("dist"),
        F.lit(0.0).alias("score"),
        "n_bytes",
        "warc_ts",
        "n_chars",
    )
    selected = select_keepers(candidates, cfg)
    return selected.select("url", "cluster_id", "rank", "keep_url", "action")


def exact_unique_representatives(pages_hashed: DataFrame) -> DataFrame:
    """One representative row per distinct content_hash (min url — stable).

    Implemented as groupBy + min_by rather than a row_number window: the
    aggregation gets map-side partial combine (duplicate texts usually
    co-reside in input partitions — crawler output is grouped by site), so
    most duplicate-text bytes never hit the shuffle. A window would sort
    the full table through one shuffle with no partial reduction.

    Scale note: this is what enters the MinHash/LSH stage; the near-dup
    verdict of a representative is fanned back out to its exact-dup peers
    by a join on content_hash.
    """
    others = [c for c in pages_hashed.columns if c != "content_hash"]
    picked = pages_hashed.groupBy("content_hash").agg(
        F.min_by(F.struct(*others), F.col("url")).alias("_rep")
    )
    return picked.select("content_hash", *[F.col(f"_rep.{c}").alias(c) for c in others])


def exact_unique_representatives_broadcast(pages_hashed: DataFrame) -> DataFrame:
    """Shuffle-light variant: the winner election shuffles ONLY
    (url, content_hash) key pairs; the text payload then reaches the
    winners through a broadcast semi-join against the (small) winner-url
    list, i.e. a second pruned pass over the source instead of a full-text
    shuffle. Right when #winners x url-width fits the broadcast budget
    (tens of millions of rows); beyond that, fall back to
    exact_unique_representatives (or bucket the source table by url).
    """
    winners = (
        pages_hashed.select("url", "content_hash")
        .groupBy("content_hash")
        .agg(F.min("url").alias("url"))
        .select("url")
    )
    return pages_hashed.join(F.broadcast(winners), "url", "left_semi")


def elect_representatives_mapside(
    sig_rows: DataFrame, key: str = "content_hash", tiebreak: str = "url"
) -> DataFrame:
    """Key-only winner election over rows that already carry their
    (map-side computed) signature payload.

    The scale-correct election for the signatures stage: the signature is
    computed on EVERY input row as a narrow map (no exchange), and the
    election then shuffles only (key, tiebreak, payload) — for MinHash
    ~0.5-1 KB fixed per row vs the multi-KB `norm_text` the min_by
    full-row election moved corpus-wide. Text bytes never enter an
    exchange at any winner count, so there is no broadcast-budget branch
    and no winner-counting job. Duplicate rows recompute the identical
    signature redundantly, but that work is embarrassingly parallel —
    exactly the resource that grows with executors — whereas the shuffle
    bytes it replaces are the resource that does not (measured: the
    signatures stage scaled only 1.83x from 1 to 4 executors when the
    election carried norm_text; VERDICT r3 item 3).

    min_by partial aggregation combines duplicates map-side, so per-map-
    partition at most one (payload) survives per key; all rows of a key
    carry the same payload (a deterministic function of the same
    normalized text), so any winner is value-identical and min(tiebreak)
    fixes determinism.
    """
    payload = [c for c in sig_rows.columns if c not in (key, tiebreak)]
    picked = sig_rows.groupBy(key).agg(
        F.min_by(F.struct(tiebreak, *payload), F.col(tiebreak)).alias("_rep")
    )
    return picked.select(
        key, *[F.col(f"_rep.{c}").alias(c) for c in [tiebreak] + payload]
    )


def exact_unique_representatives_auto(
    pages_hashed: DataFrame,
    broadcast_limit: int,
    stats: dict | None = None,
    known_upper_bound: int | None = None,
) -> DataFrame:
    """Size-aware winner election. At 100x scale (billions of distinct
    contents) a static broadcast default would kill the driver; the min_by
    shuffle is always safe — so the winner count picks the strategy.

    `known_upper_bound` (e.g. the input row count, which the pipeline has
    already measured) short-circuits the decision: winners <= rows, so if
    rows fit the broadcast budget no counting job runs at all. Only when
    the bound is absent or too large does the key-only distinct count
    (map-side combined, no payload moves) run. `stats` receives the choice.
    """
    if known_upper_bound is not None and 0 < known_upper_bound <= broadcast_limit:
        n_winners = known_upper_bound  # upper bound, not exact
        use_broadcast = True
    else:
        n_winners = pages_hashed.select("content_hash").distinct().count()
        use_broadcast = 0 < n_winners <= broadcast_limit
    if stats is not None:
        stats["rep_strategy"] = "broadcast" if use_broadcast else "min_by"
        stats["n_winners"] = n_winners
    if use_broadcast:
        return exact_unique_representatives_broadcast(pages_hashed)
    return exact_unique_representatives(pages_hashed)
