"""End-of-run summary formatter (plans/report.py) — pure Python, no Spark.

Mirrors the reference's console summary surface
(deduplication_result.py:76-119): header counts, per-stage table, skew
tiers, bounded duplicate sample.
"""

from __future__ import annotations

from py_image_dedup_spark.plans.report import format_run_summary

METRICS = [
    {"stage": "pages_meta", "metric": "rows", "value": 1000.0},
    {"stage": "pages_meta", "metric": "seconds", "value": 2.5},
    {"stage": "pages_meta", "metric": "rows_per_sec", "value": 400.0},
    {"stage": "pages_meta", "metric": "decontaminated_rows", "value": 6.0},
    {"stage": "signatures", "metric": "rows", "value": 700.0},
    {"stage": "signatures", "metric": "seconds", "value": 3.0},
    {"stage": "pairs", "metric": "rows", "value": 120.0},
    {"stage": "pairs", "metric": "seconds", "value": 4.0},
    {"stage": "pairs", "metric": "hot_buckets", "value": 2.0},
    {"stage": "pairs", "metric": "hot_bucket_rows", "value": 5000.0},
    {"stage": "pairs", "metric": "warm_buckets", "value": 7.0},
    {"stage": "actions", "metric": "rows", "value": 1000.0},
    {"stage": "actions", "metric": "seconds", "value": 1.0},
]


def test_summary_counts_and_stage_table():
    s = format_run_summary(METRICS, {"keep": 800, "delete": 194, "move": 6})
    assert "Documents processed: 1,000" not in s  # counts are plain ints
    assert "Documents processed: 1000" in s
    assert "Documents kept: 800" in s
    assert "Documents removed: 200" in s
    assert "delete: 194" in s and "move: 6" in s
    # stage table in pipeline order with thousands separators
    i_meta = s.index("pages_meta")
    i_sig = s.index("signatures")
    i_pairs = s.index("pairs")
    assert i_meta < i_sig < i_pairs
    assert "1,000" in s  # row counts use separators
    assert "Skew tiers: 2 hot buckets capped (5,000 rows excluded)" in s
    assert "7 warm buckets salted" in s
    assert "Decontaminated (benchmark-overlap) docs dropped: 6" in s


def test_summary_cluster_sample_table():
    sample = [
        {"action": "delete", "url": "https://a/x", "dist": 0.05,
         "cluster_id": -42},
        {"action": "delete", "url": "https://a/longer-url", "dist": 0.0,
         "cluster_id": 7},
    ]
    s = format_run_summary([], {"keep": 1, "delete": 2}, sample)
    assert "Action" in s and "Dist" in s
    assert "https://a/x" in s and "0.050" in s
    # columns align: both data rows start with the action at column 0
    rows = [ln for ln in s.splitlines() if ln.startswith("delete")]
    assert len(rows) == 2


def test_summary_without_optional_blocks():
    s = format_run_summary([], {"keep": 3})
    assert "Documents processed: 3" in s
    assert "Skew tiers" not in s
    assert "Decontaminated" not in s
