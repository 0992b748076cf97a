"""Paragraph-level dedup (operators/paragraphs.py) vs a pandas brute force.

The unit-level analog of the reference's whole-file duplicate groups
(py_image_dedup/library/deduplicator.py:365-421) — asserts CCNet
all-occurrence removal, order preservation, and the all-boilerplate edge.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from py_image_dedup_spark.operators.paragraphs import paragraph_dedup

DOCS = [
    # (doc_id, text) — "footer" is shared boilerplate across 3 docs;
    # "alpha beta" repeats across 2 docs; "unique ..." lines are singletons
    (1, "unique one\n\nfooter text here\n\nalpha beta"),
    (2, "unique two\n\nfooter text here"),
    (3, "footer text here\n\nalpha beta\n\nunique three"),
    (4, "unique four"),
    (5, "footer text here"),          # all-boilerplate doc
    (6, ""),                           # empty doc
    (7, "repeated inside\n\nrepeated inside"),  # intra-doc repeat only
]


def brute(min_doc_count: int) -> dict[int, tuple[str, int, int]]:
    paras = {
        i: [p.strip() for p in re.split(r"\n+", t) if p.strip()]
        for i, t in DOCS
    }
    docs_of: dict[str, set[int]] = {}
    for i, ps in paras.items():
        for p in ps:
            docs_of.setdefault(p, set()).add(i)
    out = {}
    for i, ps in paras.items():
        kept = [p for p in ps if len(docs_of[p]) < min_doc_count]
        out[i] = ("\n".join(kept), len(ps), len(ps) - len(kept))
    return out


@pytest.mark.parametrize("min_doc_count", [2, 3])
def test_paragraph_dedup_matches_bruteforce(spark, min_doc_count):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["dedup_text"], r["n_paras"], r["n_dup_paras"])
        for r in paragraph_dedup(df, min_doc_count=min_doc_count).collect()
    }
    assert got == brute(min_doc_count)


def test_intra_doc_repeat_is_not_cross_doc_boilerplate(spark):
    # "repeated inside" occurs twice but only in doc 7 => one distinct doc
    # => kept (duplication is counted over DISTINCT docs, CCNet semantics)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    row = (
        paragraph_dedup(df, min_doc_count=2)
        .where(F.col("doc_id") == 7)
        .first()
    )
    assert row["dedup_text"] == "repeated inside\nrepeated inside"
    assert row["n_dup_paras"] == 0


def test_order_preserved_after_removal(spark):
    docs = [
        (1, "z last\n\nshared\n\na first"),
        (2, "shared"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = paragraph_dedup(df, min_doc_count=2).where("doc_id = 1").first()
    # original order (z before a), NOT lexicographic
    assert row["dedup_text"] == "z last\na first"


def test_md5_key_fn_agrees_with_default(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = paragraph_dedup(df).orderBy("doc_id").collect()
    b = paragraph_dedup(
        df, key_fn=lambda c: F.md5(c.cast("binary"))
    ).orderBy("doc_id").collect()
    assert a == b
