"""P7 scope predicate (across_sources) + band-cache hygiene.

Reference semantics: candidates are restricted to the same root directory
unless SEARCH_ACROSS_ROOT_DIRS is set (py_image_dedup/library/
deduplicator.py:322-334, config.py:165-173). Engine: the url's source
(scheme://authority) joins as an extra bucket key in the pair self-join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from py_image_dedup_spark.config import DedupConfig
from py_image_dedup_spark.operators.lsh import compute_signatures
from py_image_dedup_spark.operators.modes import (
    minhash_pairs,
    pairs_stage,
    source_of,
)

BASE = (
    "rivets and lanterns swing over the harbor while the night market "
    "closes its stalls one by one under a thin persistent rain "
) * 12


@pytest.fixture(scope="module")
def cross_source_sigs(spark):
    rows = []
    for host in ("https://a.example", "https://b.example"):
        rows.append((f"{host}/doc1", BASE))
        rows.append((f"{host}/doc2", BASE + " a short appended tail"))
    df = spark.createDataFrame(rows, "url string, norm_text string")
    sigs = compute_signatures(df, DedupConfig(max_dist=0.3)).cache()
    sigs.count()
    yield sigs
    sigs.unpersist()


def _pair_set(df):
    return {(r["url_a"], r["url_b"]) for r in df.collect()}


def test_source_of_extracts_authority(spark):
    df = spark.createDataFrame(
        [("https://site7.example/42/index.html",), ("doc://src3/421",)],
        "url string",
    )
    got = [
        r[0]
        for r in df.select(source_of(F.col("url"), DedupConfig())).collect()
    ]
    assert got == ["https://site7.example", "doc://src3"]


def test_across_sources_false_scopes_pairs(spark, cross_source_sigs):
    unscoped = _pair_set(
        minhash_pairs(cross_source_sigs, DedupConfig(max_dist=0.3))
    )
    scoped = _pair_set(
        minhash_pairs(
            cross_source_sigs,
            DedupConfig(max_dist=0.3, across_sources=False),
        )
    )
    # the unscoped run must see cross-source duplicates (identical texts)
    assert any(a.split("/doc")[0] != b.split("/doc")[0] for a, b in unscoped)
    # scoped = exactly the same-source subset of unscoped (no capping at
    # this corpus size, so the tiers don't diverge between runs)
    want = {
        (a, b)
        for a, b in unscoped
        if a.split("/doc")[0] == b.split("/doc")[0]
    }
    assert scoped == want and len(scoped) > 0


def test_pairs_stage_releases_band_cache(spark, cross_source_sigs):
    """The band table is persisted for its five consumers but must be
    released once the aggregated pair table materializes (VERDICT r1 #5)."""
    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    for _ in range(2):
        pairs_stage(cross_source_sigs, DedupConfig(max_dist=0.3)).collect()
    after = jsc.getPersistentRDDs().size()
    # each call may retain its (small) localCheckpoint pair RDD, but the
    # band cache itself must be gone: leak would add >= 2 more entries
    assert after - before <= 2
