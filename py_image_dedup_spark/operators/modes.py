"""Candidate-pair strategies behind one interface (SURVEY.md §7 step 7).

Each mode maps (url, norm_text) -> verified pairs (url_a, url_b, dist,
score) under the shared contract `dist <= cfg.max_dist`:

  minhash    dist = 1 − est. Jaccard (fraction of agreeing sig positions)
  simhash    dist = Hamming(fp_a, fp_b) / simhash_bits
  substring  dist = 1 − containment (shared keys / min(|keys|)) — catches
             long verbatim blocks embedded in otherwise-different pages,
             which Jaccard dilutes away

All three share the same physical shape: signature column -> band/bucket
explode -> equi-self-join -> aggregate score -> verify. That keeps the
pipeline's scale levers (hot-bucket cap, AQE skew join, pair dedupe in the
scoring aggregation) identical across modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_image_dedup_spark.config import DedupConfig
from py_image_dedup_spark.functions.shingles import substring_keys
from py_image_dedup_spark.functions.simhash import (
    hamming_col,
    make_simhash_udf,
    simhash_blocks,
)
from py_image_dedup_spark.operators import lsh as _minhash


def source_of(url, cfg: DedupConfig):
    """Source key of a url — the root-directory analog
    (reference deduplicator.py:322-334 restricts candidates to the same
    root dir unless SEARCH_ACROSS_ROOT_DIRS, config.py:165-173)."""
    return F.regexp_extract(url, cfg.source_pattern, 0)


def _capped_self_join(bands: DataFrame, cfg: DedupConfig,
                      stats: dict | None = None) -> DataFrame:
    """Shared band/bucket self-join with skew handling; returns
    (uid_a, uid_b, score = #shared buckets), uid = xxhash64(url).

    The join shuffles COMPACT 8-byte uids, not ~60-byte url strings — at
    32-48 band rows per doc that cuts band-table and pair-agg shuffle bytes
    ~3x. Callers map uids back to urls when they join the signature table
    for verification (which they need anyway). Collision odds are birthday-
    bounded (~n^2/2^65: ~6e-8 at 1.5M docs); a collision can only ADD a
    candidate pair, which exact verification then scores on true content —
    at 10^11+ docs assign a surrogate int64 key at ingest instead.

    Scope (P7): when cfg.across_sources is False the url's source joins as
    an extra bucket key, so pairs can only form within one source — and
    every bucket shrinks to its per-source slice, which also tightens the
    skew tiers below.

    Three bucket tiers (north_rule "salted repartitioning for hot LSH
    buckets, skew-aware band-key aggregation"):
      size <= salt_threshold   plain equi-self-join
      size <= bucket_cap       SALTED: A-side keyed by uid % n_salts,
                               B-side replicated to every salt, join on
                               (band, salt) — each pair produced exactly
                               once, O(s^2) work spread over n_salts tasks
      size >  bucket_cap       excluded (boilerplate; reported via
                               hot-bucket metrics), AQE skew-join mops up
                               residual imbalance
    """
    keys = ["band_id", "band_hash"]
    bands = bands.withColumn("uid", F.xxhash64("url"))
    if not cfg.across_sources:
        bands = bands.withColumn("_src", source_of(F.col("url"), cfg))
        keys = keys + ["_src"]
    bands = bands.select("uid", *keys)
    # bucket_size rides on each band row via a map-side-combined groupBy
    # (shuffles only (keys, partial count) rows — tiny) joined back onto
    # the band table; the SMJ hint pins the join to a sort-merge whose
    # output is HashPartitioning(keys) — exactly the exchange the
    # self-join needs, so the band table still moves ONCE and the cached
    # partitioning + sort order feed both join sides exchange-free.
    # (A window count over partitionBy(keys) had the same 1-shuffle shape
    # but buffers a whole bucket per window task — the hot boilerplate
    # bucket the cap exists for became a single straggler/spill task that
    # AQE cannot split; the SMJ streams it row-by-row instead. ADVICE r3.)
    sizes = bands.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("bucket_size")
    )
    sized = bands.join(sizes.hint("shuffle_merge"), keys).persist()
    try:
        if stats is not None:
            # the A5 hot-bucket report: how many buckets each skew tier
            # caught, and how many band rows the cap excluded. ONE action:
            # hot ∪ warm rows (size > least(salt, cap) covers both tiers,
            # also when salt_threshold > bucket_cap and warm is empty) are
            # tiny by construction — boilerplate template pages at web
            # scale land here; nonzero hot counts are the signal the cap
            # is earning its keep, not an error. One cache scan + one
            # tier-subset-sized shuffle replaces the previous three
            # full-cache-scan actions (count + two distincts).
            cap, salt = cfg.bucket_cap, cfg.salt_threshold
            tier_row = (
                sized.where(F.col("bucket_size") > min(salt, cap))
                .groupBy(*keys)
                .agg(F.first("bucket_size").alias("bs"))
                .agg(
                    F.coalesce(
                        F.sum(F.when(F.col("bs") > cap, F.col("bs"))),
                        F.lit(0),
                    ).alias("hot_rows"),
                    F.count(F.when(F.col("bs") > cap, 1)).alias("hot"),
                    F.count(
                        F.when((F.col("bs") > salt) & (F.col("bs") <= cap), 1)
                    ).alias("warm"),
                )
                .first()
            )
            stats["hot_bucket_rows"] = int(tier_row["hot_rows"])
            stats["hot_buckets"] = int(tier_row["hot"])
            stats["warm_buckets"] = int(tier_row["warm"])
        # cool = neither hot nor warm (when salt_threshold > bucket_cap the
        # warm tier is empty and the cap alone gates)
        cool = sized.where(
            (F.col("bucket_size") <= cfg.salt_threshold)
            & (F.col("bucket_size") <= cfg.bucket_cap)
        )
        warm_rows = sized.where(
            (F.col("bucket_size") > cfg.salt_threshold)
            & (F.col("bucket_size") <= cfg.bucket_cap)
        )

        # the self-joins MUST NOT broadcast: both sides are the full corpus
        # band table, but Catalyst's post-filter row estimates can fall
        # under the broadcast threshold and plan a driver-killing
        # BroadcastHashJoin of the whole corpus (measured: ~500 MB single-
        # threaded hash-map build at 300k docs). shuffle_merge (not
        # shuffle_hash) because sort-merge spills: a shuffled-hash build
        # side must fit in execution memory per task, and at 1.5M docs /
        # 4 partitions it OOMs (measured) — exactly the failure a 100x run
        # would hit on any skewed shuffle split. With both sides already
        # hash-partitioned by the cache, the SMJ plans with zero exchanges.
        a, b = cool.alias("a"), cool.hint("shuffle_merge").alias("b")
        cool_pairs = (
            a.join(b, keys)
            .where(F.col("a.uid") < F.col("b.uid"))
            .select(F.col("a.uid").alias("uid_a"), F.col("b.uid").alias("uid_b"))
        )

        n_salts = max(1, cfg.n_salts)
        wa = warm_rows.withColumn(
            "salt", F.pmod(F.col("uid"), F.lit(n_salts).cast("long"))
        ).alias("a")
        wb = (
            warm_rows.withColumn(
                "salt",
                F.explode(
                    F.sequence(
                        F.lit(0).cast("long"), F.lit(n_salts - 1).cast("long")
                    )
                ),
            )
            .hint("shuffle_merge")
            .alias("b")
        )
        warm_pairs = (
            wa.join(wb, keys + ["salt"])
            .where(F.col("a.uid") < F.col("b.uid"))
            .select(F.col("a.uid").alias("uid_a"), F.col("b.uid").alias("uid_b"))
        )

        scored = (
            cool_pairs.unionByName(warm_pairs)
            .groupBy("uid_a", "uid_b")
            .agg(F.count("*").cast("double").alias("score"))
        )
        # materialize the (post-aggregation, much smaller) pair table so the
        # band cache can be released here instead of leaking for the app
        # lifetime across repeated pairs_stage calls
        return scored.localCheckpoint(eager=True)
    finally:
        sized.unpersist()


# ---------------------------------------------------------------- minhash

def minhash_signatures(pages_norm: DataFrame, cfg: DedupConfig) -> DataFrame:
    out = _minhash.compute_signatures(pages_norm, cfg)
    if cfg.norm_variants:
        # ALL_ORIENTATIONS analog (reference config.py:175-186): one extra
        # signature per canonical normalization variant, computed map-side
        # from the same norm_text — each rides the band join as its own
        # band_id range (operators/lsh.py:explode_bands)
        from py_image_dedup_spark.functions.minhash import make_minhash_udf
        from py_image_dedup_spark.functions.normalize import (
            variant_normalizer,
        )

        udf = make_minhash_udf(cfg)
        for name in cfg.norm_variants:
            out = out.withColumn(
                f"sig_v_{name}",
                udf(variant_normalizer(name)(F.col("norm_text"))),
            )
    return out


def minhash_pairs(signatures: DataFrame, cfg: DedupConfig,
                  stats: dict | None = None) -> DataFrame:
    bands = _minhash.explode_bands(signatures, cfg)
    pairs = _capped_self_join(bands, cfg, stats)
    # variant sig columns actually present (a store written without
    # variants verifies on "sig" alone even if cfg now asks for variants)
    sig_cols = ("sig",) + _minhash.variant_sig_cols(
        signatures.columns, cfg
    )
    # Full-band-agreement short-circuit: a pair can share at most one
    # bucket per band, so score == n_total_bands means EVERY band of EVERY
    # variant matched => every signature slice equal => est Jaccard exactly
    # 1 => dist exactly 0 — verification always passes. Those pairs (the
    # densest: verbatim re-crawl mass that survived url-level dedup) bypass
    # both sig-carrying probes and resolve uid->url through a slim map join
    # instead. Output is provably identical to verifying them (dist 0.0
    # either way).
    b = F.lit(float(cfg.lsh_bands * len(sig_cols)))
    # pairs just materialized (checkpoint) — ONE cheap agg job sizes both
    # subsets, and each picks the shape that never shuffles the signature
    # table when its pair list is broadcastable
    sizes = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("score") >= b, 1)).alias("n_full"),
    ).first()
    n_full = int(sizes["n_full"])
    n_rest = int(sizes["n"]) - n_full
    if stats is not None:
        stats["full_band_pairs"] = n_full
    verified = _minhash.verify_pairs(
        pairs.where(F.col("score") < b), signatures, cfg,
        broadcast_pairs=n_rest <= cfg.broadcast_pairs_limit,
        key="uid", sig_cols=sig_cols,
    )
    if n_full == 0:
        return verified
    resolved = _minhash.resolve_pair_urls(
        pairs.where(F.col("score") >= b), signatures,
        broadcast_pairs=n_full <= cfg.broadcast_pairs_limit,
    )
    return verified.unionByName(resolved)


# ---------------------------------------------------------------- simhash

def simhash_signatures(pages_norm: DataFrame, cfg: DedupConfig,
                       text_col: str = "norm_text") -> DataFrame:
    udf = make_simhash_udf(cfg)
    return pages_norm.withColumn("simhash", udf(F.col(text_col)))


def simhash_pairs(signatures: DataFrame, cfg: DedupConfig,
                  stats: dict | None = None) -> DataFrame:
    n_blocks = cfg.hamming_cutoff + 1  # pigeonhole guarantee
    bands = signatures.select(
        "url",
        F.explode(simhash_blocks(F.col("simhash"), n_blocks)).alias("b"),
    ).select("url", "b.band_id", "b.band_hash")
    pairs = _capped_self_join(bands, cfg, stats)
    sh = signatures.withColumn("uid", F.xxhash64("url")).select(
        "uid", "url", "simhash"
    )
    joined = (
        pairs.join(
            sh.select(F.col("uid").alias("uid_a"), F.col("url").alias("url_a"),
                      F.col("simhash").alias("h_a")),
            "uid_a",
        ).join(
            sh.select(F.col("uid").alias("uid_b"), F.col("url").alias("url_b"),
                      F.col("simhash").alias("h_b")),
            "uid_b",
        )
    )
    dist = hamming_col(F.col("h_a"), F.col("h_b")) / F.lit(float(cfg.simhash_bits))
    return (
        joined.withColumn("dist", dist)
        .where(F.col("dist") <= F.lit(float(cfg.max_dist)))
        .select(
            F.least("url_a", "url_b").alias("url_a"),
            F.greatest("url_a", "url_b").alias("url_b"),
            "dist", "score",
        )
    )


# -------------------------------------------------------------- substring

def substring_signatures(pages_norm: DataFrame, cfg: DedupConfig,
                         text_col: str = "norm_text",
                         keys_expr=None) -> DataFrame:
    """`keys_expr` (url-independent Column fn of the text column) overrides
    the key scheme — e.g. functions.shingles.poly_window_keys, the
    SQL-expressible variant the driver oracle uses; default is the
    production xxhash64 winnowing (same sampling semantics)."""
    keys = (
        keys_expr(F.col(text_col))
        if keys_expr is not None
        else substring_keys(
            F.col(text_col), cfg.substring_len, cfg.substring_stride
        )
    )
    return pages_norm.withColumn("sub_keys", keys)


def substring_pairs(signatures: DataFrame, cfg: DedupConfig,
                    stats: dict | None = None) -> DataFrame:
    bands = signatures.select(
        "url", F.posexplode("sub_keys").alias("band_id", "band_hash")
    ).withColumn("band_id", F.lit(0))  # key identity is the bucket
    pairs = _capped_self_join(bands, cfg, stats)
    sizes = signatures.withColumn("uid", F.xxhash64("url")).select(
        "uid", "url", F.size("sub_keys").alias("nk")
    )
    joined = (
        pairs.join(sizes.select(F.col("uid").alias("uid_a"),
                                F.col("url").alias("url_a"),
                                F.col("nk").alias("nk_a")), "uid_a")
        .join(sizes.select(F.col("uid").alias("uid_b"),
                           F.col("url").alias("url_b"),
                           F.col("nk").alias("nk_b")), "uid_b")
    )
    containment = F.col("score") / F.least(F.col("nk_a"), F.col("nk_b"))
    return (
        joined.withColumn("dist", F.lit(1.0) - containment)
        .where(
            (F.col("dist") <= F.lit(float(cfg.max_dist)))
            & (F.col("score") >= cfg.min_shared_keys)
        )
        .select(
            F.least("url_a", "url_b").alias("url_a"),
            F.greatest("url_a", "url_b").alias("url_b"),
            "dist", "score",
        )
    )


MODES = {
    "minhash": (minhash_signatures, minhash_pairs),
    "simhash": (simhash_signatures, simhash_pairs),
    "substring": (substring_signatures, substring_pairs),
}


def signature_stage(pages_norm: DataFrame, cfg: DedupConfig) -> DataFrame:
    if cfg.mode not in MODES:
        raise ValueError(f"unknown mode {cfg.mode!r}; one of {sorted(MODES)}")
    return MODES[cfg.mode][0](pages_norm, cfg)


def pairs_stage(signatures: DataFrame, cfg: DedupConfig,
                stats: dict | None = None) -> DataFrame:
    if cfg.mode not in MODES:
        raise ValueError(f"unknown mode {cfg.mode!r}; one of {sorted(MODES)}")
    return MODES[cfg.mode][1](signatures, cfg, stats)
