"""End-of-run summary report — the reference's console summary
(py_image_dedup/library/deduplication_result.py:76-119: header counts +
a per-cluster action table; library/progress_manager.py:1-71: per-phase
progress lines) re-expressed over the pipeline's metrics/actions tables.

Pure formatting over already-aggregated rows: the inputs are the tiny
driver-side artifacts the pipeline produces anyway (the metrics list and
an action->count dict, plus an OPTIONAL bounded sample of cluster rows),
so the report is O(stages + sample) regardless of corpus size — never a
corpus-scale collect.
"""

from __future__ import annotations

_STAGE_ORDER = ("pages_meta", "signatures", "pairs", "clusters", "actions")


def _fmt_table(headers: list[str], rows: list[list[str]]) -> str:
    widths = [
        max(len(headers[i]), *(len(r[i]) for r in rows)) if rows
        else len(headers[i])
        for i in range(len(headers))
    ]
    def line(cells: list[str]) -> str:
        return "  ".join(c.ljust(widths[i]) for i, c in enumerate(cells)).rstrip()
    sep = "  ".join("-" * w for w in widths)
    return "\n".join([line(headers), sep] + [line(r) for r in rows])


def format_run_summary(
    metrics: list[dict],
    action_counts: dict[str, int],
    cluster_sample: list[dict] | None = None,
) -> str:
    """Reference-style end-of-run summary.

    metrics         pipeline metrics rows ({stage, metric, value})
    action_counts   {"keep": n, "delete": m, ...}
    cluster_sample  optional bounded list of rows with url/cluster_id/
                    action/dist keys (e.g. actions.limit(20).collect())
    """
    total = sum(action_counts.values())
    removed = sum(v for k, v in action_counts.items() if k != "keep")
    lines = [
        "Summary",
        "=" * 21,
        f"Documents processed: {total}",
        f"Documents kept: {action_counts.get('keep', 0)}",
        f"Documents removed: {removed}",
    ]
    for action in sorted(action_counts):
        if action != "keep":
            lines.append(f"  {action}: {action_counts[action]}")

    by_stage: dict[str, dict[str, float]] = {}
    for m in metrics:
        by_stage.setdefault(m["stage"], {})[m["metric"]] = m["value"]
    stage_rows = []
    for stage in _STAGE_ORDER:
        vals = by_stage.get(stage)
        if not vals:
            continue
        stage_rows.append([
            stage,
            f"{vals.get('rows', 0):,.0f}",
            f"{vals.get('seconds', 0):.1f}",
            f"{vals.get('rows_per_sec', 0):,.0f}",
        ])
    if stage_rows:
        lines += [
            "",
            _fmt_table(["Stage", "Rows", "Seconds", "Rows/s"], stage_rows),
        ]

    pairs = by_stage.get("pairs", {})
    if "hot_buckets" in pairs:
        lines += [
            "",
            f"Skew tiers: {pairs.get('hot_buckets', 0):.0f} hot buckets "
            f"capped ({pairs.get('hot_bucket_rows', 0):,.0f} rows excluded), "
            f"{pairs.get('warm_buckets', 0):.0f} warm buckets salted",
        ]
    dec = by_stage.get("pages_meta", {}).get("decontaminated_rows")
    if dec is not None:
        lines.append(f"Decontaminated (benchmark-overlap) docs dropped: "
                     f"{dec:,.0f}")

    if cluster_sample:
        # only render Dist when the rows actually carry one — a constant
        # 0.000 column over action-table rows reads as a real measurement
        has_dist = any("dist" in r and r["dist"] is not None
                       for r in cluster_sample)
        rows = [
            [
                str(r.get("action", "")),
                str(r.get("url", "")),
                *([f"{r.get('dist') or 0.0:.3f}"] if has_dist else []),
                str(r.get("cluster_id", "")),
            ]
            for r in cluster_sample
        ]
        headers = ["Action", "Url"] + (["Dist"] if has_dist else []) + ["Cluster"]
        lines += ["", _fmt_table(headers, rows)]
    return "\n".join(lines)
