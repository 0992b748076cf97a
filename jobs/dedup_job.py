"""spark-submit entry point for the dedup pipeline.

Cluster usage (north_rule packaging):

    python scripts/build_pyfiles.py          # -> dist/py_image_dedup_spark.zip
    spark-submit --py-files dist/py_image_dedup_spark.zip \\
        jobs/dedup_job.py \\
        --input  <warehouse>/pages_iceberg_or_parquet \\
        --output <warehouse>/dedup_ckpt \\
        --mode minhash --max-dist 0.1

Local smoke:

    python jobs/dedup_job.py --synthetic-groups 1000 --output /tmp/ckpt

Each stage commits to <output>/<stage>; re-running with --resume skips
completed stages (the Iceberg-checkpoint resume seam, SURVEY.md §3.1).
"""

from __future__ import annotations

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from py_image_dedup_spark.config import DedupConfig, DEFAULT_RULES
from py_image_dedup_spark.plans.pipeline import run_dedup_pipeline
from py_image_dedup_spark.session import build_session


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="pages table path (parquet/Iceberg dir)")
    p.add_argument("--synthetic-groups", type=int, default=0,
                   help="generate a synthetic corpus instead of --input")
    p.add_argument("--output", required=True, help="checkpoint/output dir")
    # config-mapped flags default to None = "not given on the command line";
    # the effective value then comes from the layered sources (dataclass
    # default < YAML < env), with an explicit flag as the top layer —
    # mirroring the reference's container-app-conf precedence (config.py:58-66)
    p.add_argument("--config-yaml", default=None,
                   help="optional YAML config file (lowest-priority layer)")
    p.add_argument("--mode", default=None,
                   choices=["minhash", "simhash", "substring"])
    p.add_argument("--max-dist", type=float, default=None)
    p.add_argument("--shingle-k", type=int, default=None)
    p.add_argument("--num-hashes", type=int, default=None)
    p.add_argument("--bands", type=int, default=None)
    p.add_argument("--rows", type=int, default=None)
    p.add_argument("--bucket-cap", type=int, default=None)
    p.add_argument("--rules", default=None,
                   help="comma-separated prioritization rules "
                        f"(default: {','.join(DEFAULT_RULES)})")
    p.add_argument("--max-ts-delta-s", type=float, default=None)
    p.add_argument(
        "--decontaminate-path", default=None,
        help="parquet path of a benchmark/eval set; pages sharing a "
             "verbatim --decontaminate-ngram token gram with it are "
             "dropped before dedup (in-walk exclusion, "
             "deduplicator.py:266-272 analog)")
    p.add_argument("--decontaminate-ngram", type=int, default=None)
    p.add_argument(
        "--stages", default="all",
        choices=["all", "pages_meta", "signatures", "pairs", "clusters"],
        help="run the pipeline only up to (and including) this stage; "
             "'signatures' is the reference's analyse-only entry point "
             "(py_image_dedup/cli.py:38-41)")
    p.add_argument(
        "--from-stage", default=None,
        choices=["pages_meta", "signatures", "pairs", "clusters", "actions"],
        help="rebuild from this stage onward, resuming everything before "
             "it from committed outputs (implies --resume); "
             "'--from-stage pairs' is the reference's --skip-analyse-phase "
             "(py_image_dedup/cli.py:49-52): reuse the committed index, "
             "redo find/select")
    p.add_argument("--no-cache-pages", action="store_true",
                   help="skip persisting the normalized+hashed projection "
                        "(the corpus >> cluster-RAM shape: consumers "
                        "recompute the narrow map from the scan)")
    p.add_argument("--norm-variants", default=None,
                   help="comma list of extra canonical normalizations to "
                        "sign under (ALL_ORIENTATIONS analog), e.g. "
                        "strip_punct")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--master", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p.parse_args(argv)


def build_config(args: argparse.Namespace) -> DedupConfig:
    """Layered effective config: defaults < --config-yaml < env vars
    (PY_IMAGE_DEDUP_SPARK_*) < explicit command-line flags."""
    from py_image_dedup_spark.config import config_from_sources

    flag_map = {
        "mode": args.mode,
        "max_dist": args.max_dist,
        "shingle_k": args.shingle_k,
        "num_hashes": args.num_hashes,
        "lsh_bands": args.bands,
        "lsh_rows": args.rows,
        "bucket_cap": args.bucket_cap,
        "max_ts_delta_s": args.max_ts_delta_s,
        "decontaminate_path": args.decontaminate_path,
        "decontaminate_ngram": args.decontaminate_ngram,
    }
    overrides = {k: v for k, v in flag_map.items() if v is not None}
    if args.rules is not None:
        overrides["prioritization_rules"] = tuple(
            r for r in args.rules.split(",") if r
        )
    if args.dry_run:
        overrides["dry_run"] = True
    if args.no_cache_pages:
        overrides["cache_pages"] = False
    if args.norm_variants is not None:
        overrides["norm_variants"] = tuple(
            v for v in args.norm_variants.split(",") if v
        )
    return config_from_sources(yaml_path=args.config_yaml, **overrides)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    if not args.input and not args.synthetic_groups:
        print("error: need --input or --synthetic-groups", file=sys.stderr)
        return 2
    cfg = build_config(args)
    spark = build_session(
        app_name=f"dedup-{cfg.mode}",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("WARN")
    if args.synthetic_groups:
        from py_image_dedup_spark.sources.pages import generate_pages

        pages = generate_pages(spark, args.synthetic_groups)
    else:
        pages = spark.read.parquet(args.input)

    resume = args.resume
    if args.from_stage is not None:
        from py_image_dedup_spark.plans.pipeline import invalidate_from

        dropped = invalidate_from(args.output, args.from_stage)
        print(f"rebuilding stages {dropped} (earlier stages resume)")
        resume = True

    until = None if args.stages == "all" else args.stages
    out = run_dedup_pipeline(
        spark, pages, cfg, args.output, resume=resume, until_stage=until
    )
    if "actions" in out:
        summary = {
            r["action"]: r["count"]
            for r in out["actions"].groupBy("action").count().collect()
        }
        print(f"actions summary: {summary}")
        # reference-style end-of-run console summary
        # (deduplication_result.py:76-119): counts + per-stage table +
        # a BOUNDED sample of duplicate rows — never a corpus-scale collect
        from py_image_dedup_spark.plans.report import format_run_summary

        # enrich the bounded sample with the real per-doc distance from the
        # clusters stage (the actions table deliberately doesn't carry dist;
        # a constant placeholder column would read as a measurement). The
        # lookup is an isin over <=10 urls — a pushed-down filter scan of
        # one stage table, never corpus-scale work.
        sample = [
            r.asDict()
            for r in out["actions"].where("action != 'keep'").limit(10).collect()
        ]
        if "clusters" in out and sample:
            from pyspark.sql import functions as F

            urls = [r["url"] for r in sample]
            dmap = {
                r["url"]: r["dist"]
                for r in out["clusters"]
                .where(F.col("url").isin(urls))
                .select("url", "dist")
                .collect()
            }
            for r in sample:
                r["dist"] = dmap.get(r["url"])
        metrics_rows = [r.asDict() for r in out["metrics"].collect()]
        print(format_run_summary(metrics_rows, summary, sample))
    else:
        last = [s for s in out if s != "metrics"][-1]
        print(f"stopped after stage {last}: {out[last].count()} rows")
    out["metrics"].orderBy("stage", "metric").show(50, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
