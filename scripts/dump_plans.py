"""Dump `.explain("formatted")` physical plans for the headline queries
into PLANS.md — the plan-quality audit trail (predicate pushdown reaching
the parquet scan, column pruning in ReadSchema, broadcast vs sort-merge
join choices, WholeStageCodegen spans).

Usage: python scripts/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (query name, what the plan should show — checked by eye and by the greps
# at the bottom of PLANS.md)
AUDITED = [
    ("exclusion_filter", "filter pushed to parquet scan (PushedFilters), "
                         "2-column ReadSchema despite a 6-column table"),
    ("count_by_source", "partial_count/partial_sum before the exchange "
                        "(map-side combine), final agg after"),
    ("point_lookup", "IsNotNull + EqualTo pushed into the scan"),
    ("broadcast_join", "BroadcastHashJoin with the small side broadcast, "
                       "no shuffle of the big side"),
    ("topk_by_source", "single shuffle for the window, rank filter above"),
    ("exact_dedup_actions", "one Exchange on content key; window + "
                            "row_number in one stage"),
    ("ann_topk", "BroadcastNestedLoopJoin with broadcast QUERY side — "
                 "corpus scanned once, never shuffled"),
    ("ivf_ann_topk", "cell equi-join (shuffle key = int cell), "
                     "ArrowEvalPython only for cell assignment"),
    ("minhash_lsh_pairs", "band-key SortMergeJoin (spillable), broadcast "
                          "anti-joins for hot/warm bucket tiers"),
    ("cluster_size_histogram", "two HashAggregates each with a partial_ "
                               "phase before its exchange (map-side "
                               "combine on component, then on size)"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entry
    from py_image_dedup_spark.session import build_session

    spark = build_session(app_name="plan-audit", master="local[2]",
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    out = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        f"`explain(\"formatted\")` at {sf_dir} (plan shape is data-size-"
        "independent; AQE may further coalesce/re-plan at runtime). "
        "Regenerate with `python scripts/dump_plans.py`.",
        "",
    ]
    for name, expect in AUDITED:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue().rstrip()
        # keep the operator tree + the scan details; drop the (very long)
        # per-operator field dumps except scans/joins/aggregates
        lines = plan.splitlines()
        tree_end = next(
            (i for i, ln in enumerate(lines) if not ln.strip()), len(lines)
        )
        tree = lines[:tree_end]
        keep_kw = ("Scan parquet", "PushedFilters", "ReadSchema",
                   "BroadcastHashJoin", "SortMergeJoin", "HashAggregate",
                   "BroadcastNestedLoopJoin", "Arguments: ")
        details: list[str] = []
        for i, ln in enumerate(lines[tree_end:], start=tree_end):
            if ln.startswith("(") and any(
                k in ln for k in ("Scan parquet", "Join", "HashAggregate")
            ):
                details.append(ln)
            elif any(k in ln for k in keep_kw) and len(ln) < 400:
                details.append(ln)
        out += [f"## {name}", "", f"*Expected:* {expect}", "", "```"]
        out += tree
        if details:
            out += ["", "-- key operator details --"]
            out += details
        out += ["```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
