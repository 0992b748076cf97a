"""Adapter: driver-provided `documents` table -> the engine's pages shape.

`/root/testdata/sf*/documents.parquet` has (doc_id, text, lang, source,
n_chars). The engine's canonical input is pages(url, warc_ts, html, text,
lang) (BASELINE.json input_hint); this adapter derives the url / timestamp /
size columns deterministically so every dedup operator — and its DuckDB
oracle twin — can run over the shared testdata.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from py_image_dedup_spark.functions.normalize import normalize_text


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def documents_as_pages(docs: DataFrame) -> DataFrame:
    """Adds: url (doc://source/doc_id), warc_ts (epoch + doc_id s),
    n_bytes, norm_text, n_chars_norm. SQL twins in __spark_entry__
    mirror each expression exactly."""
    return (
        docs.withColumn(
            "url",
            F.concat(
                F.lit("doc://"), F.col("source"), F.lit("/"),
                F.col("doc_id").cast("string"),
            ),
        )
        .withColumn("warc_ts", F.timestamp_seconds(F.col("doc_id")))
        .withColumn("n_bytes", F.octet_length("text").cast("long"))
        .withColumn("norm_text", normalize_text("text"))
        .withColumn("n_chars_norm", F.length("norm_text").cast("long"))
    )
