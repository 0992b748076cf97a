"""Keep-best-copy selection policy as window functions.

Re-expresses the reference's quality-ranked selection
(py_image_dedup/library/deduplicator.py:385-506):

* `_sort_by_quality_descending` (deduplicator.py:418-506) — an ordered list
  of named rules, each contributing one ascending sort key; first row wins.
  Here: `row_number()` over a window partitioned by `cluster_id`, ordered by
  the rule columns, with `url` always appended as the deterministic
  tiebreak (deduplicator.py:496-500).
* keep-top-1 / mark rest (deduplicator.py:392-394).
* mod-time-delta exception (deduplicator.py:397-410): non-keepers whose
  |warc_ts − keeper_ts| exceeds the configured delta are also kept.

Rule vocabulary: the reference's 17 image rules remapped to web-text columns
(SURVEY.md §2.5 table). Divergence note (SURVEY.md §7 risk 1): the reference
builds *ragged* tuples — the exif rules append nothing when the key is
absent. Columns can't be ragged; absent `meta` counts as size 0. The
reference's own tests never exercise the ragged case.

Expected input columns:
    url string, cluster_id (any orderable), dist double, score double,
    n_bytes long, warc_ts timestamp, n_chars long, meta map<string,string>
Missing columns are only required if a rule referencing them is active.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from py_image_dedup_spark.config import DedupConfig

ACTION_KEEP = "keep"
ACTION_DELETE = "delete"

def _rule_columns() -> dict[str, Column]:
    """rule name -> ascending sort key (smaller = better), mirroring
    deduplicator.py:428-494 comment-for-comment."""
    _URL_NAME = F.regexp_extract(F.col("url"), r"[^/]+$", 0)
    _URL_DIR = F.regexp_replace(F.col("url"), r"/[^/]+$", "")
    ts = F.unix_timestamp(F.col("warc_ts"))
    meta_size = F.size(F.coalesce(F.col("meta"), F.create_map())).cast("long")
    name_has_copy = F.lower(_URL_NAME).contains("copy").cast("int")
    return {
        # exif-data analog: richer metadata wins
        "more-meta": -meta_size,
        "less-meta": meta_size,
        # file-size analog
        "bigger-size": -F.col("n_bytes"),
        "smaller-size": F.col("n_bytes"),
        # modification-date analog (north-star default: older wins)
        "newer-timestamp": -ts,
        "older-timestamp": ts,
        # similarity distance (deduplicator.py:455-460)
        "smaller-distance": F.col("dist"),
        "bigger-distance": -F.col("dist"),
        # "copy" in the url leaf name (deduplicator.py:463-468):
        # contains-... => copy-marked files are WORSE (True sorts last);
        # doesnt-contain-... => copy-marked files are BETTER.
        "contains-copy-in-url": name_has_copy,
        "doesnt-contain-copy-in-url": F.lit(1) - name_has_copy,
        # name/path lengths (deduplicator.py:469-482)
        "longer-url-name": -F.length(_URL_NAME),
        "shorter-url-name": F.length(_URL_NAME),
        "longer-url-path": -F.length(_URL_DIR),
        "shorter-url-path": F.length(_URL_DIR),
        # retrieval score = shared-band count (deduplicator.py:483-488)
        "higher-score": -F.col("score"),
        "lower-score": F.col("score"),
        # pixel-count analog: amount of clean text (deduplicator.py:489-494)
        "more-content": -F.col("n_chars"),
        "less-content": F.col("n_chars"),
    }


# The policy-rule vocabulary, session-free (building the Columns above
# needs an active SparkContext; config validation must not). Kept in sync
# with _rule_columns by tests/test_select_policy.py.
RULE_NAMES: frozenset[str] = frozenset({
    "more-meta", "less-meta", "bigger-size", "smaller-size",
    "newer-timestamp", "older-timestamp", "smaller-distance",
    "bigger-distance", "contains-copy-in-url", "doesnt-contain-copy-in-url",
    "longer-url-name", "shorter-url-name", "longer-url-path",
    "shorter-url-path", "higher-score", "lower-score", "more-content",
    "less-content",
})


def rule_names() -> frozenset[str]:
    """The policy-rule vocabulary — the config validator's source of truth."""
    return RULE_NAMES


def policy_sort_keys(cfg: DedupConfig) -> list[Column]:
    rules = _rule_columns()
    unknown = [r for r in cfg.prioritization_rules if r not in rules]
    if unknown:
        raise ValueError(f"unknown prioritization rules: {unknown}")
    # url asc is always the final key (deduplicator.py:496-500)
    return [rules[r] for r in cfg.prioritization_rules] + [F.col("url")]


def select_keepers(candidates: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Per cluster: rank by policy, keep top-1, mark rest delete; apply the
    mod-time-delta exception. Adds columns rank, keep_url, action.

    One shuffle (window over cluster_id); everything else is projection.

    Scale note: a window partition is one task, so the wall-clock of this
    stage is bounded below by the LARGEST cluster (a boilerplate template
    with 10M exact members at 100 TB sorts on one core). The pipeline
    emits max/p99 cluster sizes as actions-stage metrics so that
    straggler is observable before it hurts; the mitigation when it trips
    is upstream, not here — the exact pre-pass (operators/exact.py)
    collapses exact-duplicate members to one representative per
    content_hash before clustering, which is what keeps near-dup cluster
    cardinality bounded by distinct-content counts.
    """
    w = Window.partitionBy("cluster_id").orderBy(*policy_sort_keys(cfg))
    wc = Window.partitionBy("cluster_id")
    ranked = candidates.withColumn("rank", F.row_number().over(w))
    keeper_url = F.max(F.when(F.col("rank") == 1, F.col("url"))).over(wc)
    ranked = ranked.withColumn("keep_url", keeper_url)

    is_keeper = F.col("rank") == 1
    if cfg.max_ts_delta_s is not None:
        keeper_ts = F.max(
            F.when(F.col("rank") == 1, F.unix_timestamp(F.col("warc_ts")))
        ).over(wc)
        exempt = (
            F.abs(F.unix_timestamp(F.col("warc_ts")) - keeper_ts)
            > F.lit(float(cfg.max_ts_delta_s))
        )
        action = F.when(is_keeper | exempt, F.lit(ACTION_KEEP)).otherwise(
            F.lit(ACTION_DELETE)
        )
    else:
        action = F.when(is_keeper, F.lit(ACTION_KEEP)).otherwise(F.lit(ACTION_DELETE))
    return ranked.withColumn("action", action)
