"""Deterministic sampling / splitting — training-data curation primitives.

A 100 TB pipeline cannot use rand(): re-runs must assign every document to
the same split, regardless of partitioning, cluster size, or Spark
version, and the assignment must be auditable from the row alone. Both
operators key on md5(id || ':' || salt) and decide by comparing the
leading hex digits LEXICOGRAPHICALLY — fixed-width lowercase hex makes
lexicographic order equal numeric order, so the rule is portable to any
engine that has md5 (the DuckDB twin uses the identical expression; no
bigint conversion games). Pure projection: no shuffle, no UDF, prunes to
the id column.

The reference has no split/sample surface (it deletes files in place);
these are the task brief's "operations a large-scale training-data
pipeline would need".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 4 hex digits = 65536 buckets: split boundaries quantize to 1/65536
# (0.0015%), fine-grained enough for any realistic split ratio
_HEX_DIGITS = 4
_BUCKETS = 16 ** _HEX_DIGITS


def _bucket_hex(id_col: Column, salt: str) -> Column:
    """Leading hex digits of md5(id:salt) — the deterministic bucket key."""
    return F.substring(
        F.md5(F.concat_ws(":", id_col.cast("string"), F.lit(salt))
              .cast("binary")),
        1, _HEX_DIGITS,
    )


def _hex_edge(frac: float) -> str:
    """Cumulative fraction -> fixed-width lowercase hex boundary. At
    frac >= 1 the numeric edge (16^k) would render one char wider and
    lexicographic-compare WRONG against the fixed-width buckets, so emit
    "g" — a single char above 'f' that every hex bucket sorts below, in
    any engine."""
    edge = min(_BUCKETS, max(0, round(frac * _BUCKETS)))
    if edge >= _BUCKETS:
        return "g"
    return format(edge, f"0{_HEX_DIGITS}x")


def deterministic_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Add a `split` column assigning each row to one of the named splits
    with the given weights (normalized; insertion order fixes the hex
    ranges). Same (id, salt) -> same split, forever, on any engine."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    bucket = _bucket_hex(F.col(id_col), salt)
    acc = 0.0
    expr = None
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = bucket < F.lit(_hex_edge(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic `fraction` of rows: the subset is stable across
    runs AND nested (hash_sample(0.1) is a superset of hash_sample(0.05)
    at the same salt) — the property that lets scaling-law experiments
    reuse their smaller corpora."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.where(
        _bucket_hex(F.col(id_col), salt) < F.lit(_hex_edge(fraction))
    )
