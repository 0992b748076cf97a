"""Shingle / substring expressions — pure built-in column exprs (JVM-side).

These power (a) exact n-gram Jaccard verification (the oracle-checkable twin
of the MinHash estimate) and (b) the substring-containment candidate mode
(SURVEY.md §1.3 "suffix-array substring mode": sampled fixed-width substring
fingerprints; shared key => containment candidate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def char_shingles(col: Column | str, k: int) -> Column:
    """Distinct character k-shingles as array<string>. Built-in only:
    transform over a position sequence + substring + array_distinct.

    Texts shorter than k yield a single whole-text shingle (matches the
    degenerate-doc convention in functions/minhash.py).
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
        lambda i: c.substr(i, F.lit(k)),
    )
    return F.array_distinct(grams)


def shingle_set_jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two shingle-set columns — ratio of two ints in
    double, so bit-identical across engines (DuckDB oracle safe)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def substring_keys(col: Column | str, length: int, stride: int) -> Column:
    """Content-defined substring fingerprints (winnowing-style mod-p
    sampling): hash EVERY `length`-char window, keep windows whose hash
    ≡ 0 (mod `stride`) — expected 1-in-`stride` sampled, and the sampled
    positions are determined by CONTENT, so they survive the position
    shifts that insertions/deletions cause (a fixed-stride grid would lose
    alignment after the first edit). Shared key => containment candidate.

    Docs too short to sample anything fall back to one whole-text key.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(length - 1), F.lit(1))),
        lambda i: F.xxhash64(c.substr(i, F.lit(length))),
    )
    sampled = F.array_distinct(
        F.filter(grams, lambda h: F.pmod(h, F.lit(stride)) == 0)
    )
    return F.when(F.size(sampled) > 0, sampled).otherwise(
        F.array(F.xxhash64(c))
    )
