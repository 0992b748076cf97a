"""Deterministic split/sample operators (operators/sampling.py)."""

from __future__ import annotations

from py_image_dedup_spark.operators.sampling import (
    deterministic_split,
    hash_sample,
)


def test_split_is_exhaustive_disjoint_and_stable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = deterministic_split(df, w).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in got}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000          # exhaustive + disjoint
    assert 0.75 < counts["train"] / 2000 < 0.85  # ~binomial tolerance
    # stability: identical assignment on re-run and on a repartitioned copy
    a = {r["doc_id"]: r["split"]
         for r in deterministic_split(df, w).collect()}
    b = {r["doc_id"]: r["split"]
         for r in deterministic_split(df.repartition(7), w).collect()}
    assert a == b


def test_hash_sample_nested_and_salted(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s05 = {r["doc_id"] for r in hash_sample(df, 0.05).collect()}
    s20 = {r["doc_id"] for r in hash_sample(df, 0.20).collect()}
    assert s05 <= s20                      # nested at the same salt
    assert 0.10 < len(s20) / 2000 < 0.30
    other = {r["doc_id"] for r in hash_sample(df, 0.20, salt="v2").collect()}
    assert other != s20                    # a new salt is a fresh draw
    assert hash_sample(df, 0.0).count() == 0
    assert hash_sample(df, 1.0).count() == 2000
