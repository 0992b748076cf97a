"""Paragraph-level exact dedup — C4/CCNet-style boilerplate removal.

Complements the document-level modes (operators/modes.py): instead of
dropping whole near-duplicate documents, remove the individual paragraphs
(or sentences — the separator is a parameter) that repeat across many
documents: navigation chrome, cookie banners, license footers. This is the
unit-level analog of the reference's whole-file duplicate groups
(py_image_dedup/library/deduplicator.py:365-421 groups whole images); web
text needs both granularities.

Scale shape (100 TB): one posexplode (no shuffle), one map-side-combined
count_distinct aggregation keyed by the paragraph HASH (never the full
paragraph string — at web scale the hot boilerplate strings are exactly the
long ones), one anti-join of the exploded table against the duplicated-key
set (AQE picks broadcast when the dup list is small, shuffle otherwise —
boilerplate follows a Zipf law, so the dup list is orders of magnitude
smaller than the paragraph table), and one per-doc re-aggregation that
restores paragraph order from the captured posexplode index. Nothing is
quadratic; every shuffle is keyed by hash or doc id.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_paragraphs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = r"\n+",
) -> DataFrame:
    """(id, pos, para): trimmed, non-empty paragraph units with their
    original position — the order key the re-assembly sorts on."""
    return (
        docs.select(
            id_col, F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para")
        )
        .withColumn("para", F.trim("para"))
        .where(F.length("para") > 0)
    )


def duplicated_paragraphs(
    paras: DataFrame,
    min_doc_count: int = 2,
    id_col: str = "doc_id",
    key_fn: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Keys of paragraphs appearing in >= min_doc_count DISTINCT docs.

    `key_fn` maps the paragraph column to the grouping key. Default is
    xxhash64 (8-byte shuffle key — the scale choice); the driver oracle
    passes F.md5 so DuckDB can recompute the identical key. A hash
    collision can only over-delete one extra paragraph with probability
    ~n_distinct^2/2^65 — at 10^12 paragraphs switch to a 128-bit key
    (md5) rather than the string itself.
    """
    key = (key_fn or F.xxhash64)(F.col("para"))
    return (
        paras.select(key.alias("pkey"), id_col)
        .groupBy("pkey")
        .agg(F.count_distinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_doc_count)
        .select("pkey")
    )


def paragraph_dedup(
    docs: DataFrame,
    min_doc_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = r"\n+",
    joiner: str = "\n",
    key_fn: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Remove every paragraph occurring in >= min_doc_count distinct docs.

    Returns one row per input doc: (id, dedup_text, n_paras,
    n_dup_paras). Docs whose paragraphs were ALL boilerplate survive with
    dedup_text = '' (so downstream length/quality filters — not this
    operator — decide their fate). Paragraph order is preserved via the
    posexplode index; removal is all-occurrence (CCNet semantics), not
    keep-first: cross-doc repeated text is boilerplate wherever it sits.
    """
    keyf = key_fn or F.xxhash64
    paras = split_paragraphs(docs, id_col, text_col, sep)
    dup = duplicated_paragraphs(paras, min_doc_count, id_col, keyf)
    tagged = paras.withColumn("pkey", keyf(F.col("para")))
    kept = tagged.join(dup, "pkey", "left_anti")
    per_doc = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s.para,
            ),
            joiner,
        ).alias("dedup_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = paras.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_paras"))
    return (
        docs.select(id_col)
        .join(totals, id_col, "left")
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
            F.coalesce("n_paras", F.lit(0)).cast("long").alias("n_paras"),
            (F.coalesce("n_paras", F.lit(0)) - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_dup_paras"),
        )
    )
