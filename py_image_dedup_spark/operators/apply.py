"""Action application — the engine's phase 5 (delete / move execution).

The reference's `_delete_files` / `_move_files`
(py_image_dedup/library/deduplicator.py:608-666) unlink or relocate files
on disk, gated on DRY_RUN (config.py:68-75). The table analog:

* delete  -> anti-join the pages table against delete-marked urls
             (on Iceberg: `MERGE INTO pages USING actions ... WHEN MATCHED
             AND action='delete' THEN DELETE`)
* move    -> route delete-marked rows to a quarantine table instead
             (duplicates_target_directory, config.py:145-156); the
             reference's filecmp-dedupe of move targets collapses to the
             quarantine table's MERGE key
* dry-run -> compute both frames, write nothing (the caller inspects)

Also provides the A3 summary (deduplication_result.py:80-119): counts per
action plus reclaimable bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_image_dedup_spark.operators.select import ACTION_DELETE, ACTION_KEEP


def split_actions(
    pages: DataFrame, actions: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """(kept_pages, removed_pages). Join on url; urls missing from the
    actions table (never entered dedup scope) are kept."""
    marked = actions.where(F.col("action") == ACTION_DELETE).select("url")
    kept = pages.join(marked, "url", "left_anti")
    removed = pages.join(marked, "url", "left_semi")
    return kept, removed


def apply_actions(
    pages: DataFrame,
    actions: DataFrame,
    kept_path: str | None = None,
    quarantine_path: str | None = None,
    dry_run: bool = False,
) -> dict[str, DataFrame]:
    """Execute the action table. With paths given (and not dry_run), writes
    kept pages and quarantined duplicates as parquet (Iceberg MERGE on a
    cluster). Always returns the frames for inspection."""
    kept, removed = split_actions(pages, actions)
    if not dry_run:
        if kept_path:
            kept.write.mode("overwrite").parquet(kept_path)
        if quarantine_path:
            removed.write.mode("overwrite").parquet(quarantine_path)
    return {"kept": kept, "removed": removed}


def action_summary(actions: DataFrame, pages_meta: DataFrame) -> DataFrame:
    """Counts + reclaimable bytes per action (deduplication_result.py:80-119).
    Output: action, n, total_bytes."""
    joined = actions.join(pages_meta.select("url", "n_bytes"), "url", "left")
    return (
        joined.groupBy("action")
        .agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum("n_bytes"), F.lit(0)).cast("long").alias("total_bytes"),
        )
    )


def keepers(actions: DataFrame) -> DataFrame:
    """Urls surviving dedup (the canonical corpus view)."""
    return actions.where(F.col("action") == ACTION_KEEP).select(
        "url", "cluster_id"
    )
