"""LSH candidate generation + verification — the similarity range "join".

Replaces the reference's per-file Elasticsearch query loop
(py_image_dedup/library/deduplicator.py:304-362 driving
elasticsearchstorebackend.py:209-222): image-match stores fixed-width
signature "words" in ES and any shared word makes a candidate; here the
signature is MinHash and the words are LSH bands.

Dataflow (one distributed plan, no driver loop):
  signatures --explode bands--> (url, band_id, band_hash)
    --hot-bucket cap (broadcast anti-join)--> capped bands
    --self-equi-join on (band_id, band_hash), url_a < url_b-->
    --groupBy pair (score = #shared bands)--> candidate pairs
    --join back signatures x2, est Jaccard--> verified pairs (dist <= max_dist)

Scale notes (north_rule):
 * The band self-join shuffles on (band_id, band_hash) — the natural key;
   AQE skew-join splits residual hot partitions.
 * Zipfian boilerplate buckets are CAPPED: buckets with more members than
   cfg.bucket_cap are excluded from pair generation and surfaced via
   `hot_buckets` for metrics (exact-dup pre-pass has already removed
   identical-text mass, so hot buckets are template noise whose O(n^2)
   pairs would dominate cost). The hot list is tiny by construction =>
   broadcast anti-join, no extra shuffle of the big side beyond the join.
 * Pair dedup across bands happens in the same aggregation that computes
   the shared-band score — one shuffle, map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_image_dedup_spark.config import DedupConfig
from py_image_dedup_spark.functions.minhash import est_jaccard_col, make_minhash_udf


def compute_signatures(pages_norm: DataFrame, cfg: DedupConfig,
                       text_col: str = "norm_text") -> DataFrame:
    """(url, ...) -> (url, sig array<int>). Arrow-batched NumPy kernel."""
    udf = make_minhash_udf(cfg)
    return pages_norm.withColumn("sig", udf(F.col(text_col)))


def explode_bands(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(url, sig) -> (url, band_id, band_hash). band_hash = xxhash64 over the
    band's signature slice + band_id; computed JVM-side via transform +
    posexplode — no Python."""
    r = cfg.lsh_rows
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(cfg.lsh_bands - 1)),
        lambda i: F.xxhash64(F.slice(F.col("sig"), i * r + 1, r), i),
    )
    return signatures.select(
        "url", F.posexplode(bands).alias("band_id", "band_hash")
    )


def hot_buckets(bands: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Buckets whose membership exceeds the cap — metrics + exclusion list."""
    return (
        bands.groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("bucket_size"))
        .where(F.col("bucket_size") > cfg.bucket_cap)
    )


def candidate_pairs(bands: DataFrame, cfg: DedupConfig,
                    hot: DataFrame | None = None) -> DataFrame:
    """Band self-join -> (url_a, url_b, score) with score = #shared bands."""
    if hot is None:
        hot = hot_buckets(bands, cfg)
    capped = bands.join(
        F.broadcast(hot.select("band_id", "band_hash")),
        ["band_id", "band_hash"],
        "left_anti",
    )
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = (
        a.join(b, ["band_id", "band_hash"])
        .where(F.col("a.url") < F.col("b.url"))
        .select(F.col("a.url").alias("url_a"), F.col("b.url").alias("url_b"))
    )
    return pairs.groupBy("url_a", "url_b").agg(
        F.count("*").cast("double").alias("score")
    )


def verify_pairs(pairs: DataFrame, signatures: DataFrame,
                 cfg: DedupConfig, broadcast_pairs: bool = False) -> DataFrame:
    """Exact re-check at the signature level: dist = 1 - estimated Jaccard
    (fraction of agreeing positions); keep dist <= max_dist. Mirrors the
    reference's distance_cutoff filter (elasticsearchstorebackend.py:55,86).

    Two physical shapes (caller picks by MEASURED pair count — pairs come
    out of a materialized checkpoint, so counting is cheap):
      broadcast_pairs=True   the pair list rides as a broadcast into two
                             shuffle-free probes of the signature table
                             (one scan each, signatures NEVER shuffled),
                             then the two sig-carrying halves — pair-count
                             sized, not corpus-sized — merge on the pair
                             key. Right whenever pairs << corpus.
      broadcast_pairs=False  plain two-step shuffle join — the safe shape
                             when the pair list itself is huge.
    """
    sigs = signatures.select("url", "sig")
    if broadcast_pairs:
        p = F.broadcast(pairs.select("url_a", "url_b", "score"))
        ja = sigs.withColumnRenamed("url", "url_a").withColumnRenamed(
            "sig", "sig_a"
        ).join(p, "url_a")
        jb = sigs.withColumnRenamed("url", "url_b").withColumnRenamed(
            "sig", "sig_b"
        ).join(F.broadcast(pairs.select("url_a", "url_b")), "url_b")
        joined = ja.join(jb, ["url_a", "url_b"])
    else:
        joined = (
            pairs.join(sigs.withColumnRenamed("url", "url_a")
                       .withColumnRenamed("sig", "sig_a"), "url_a")
            .join(sigs.withColumnRenamed("url", "url_b")
                  .withColumnRenamed("sig", "sig_b"), "url_b")
        )
    est_j = est_jaccard_col(F.col("sig_a"), F.col("sig_b"))
    return (
        joined.withColumn("dist", (F.lit(1.0) - est_j))
        .where(F.col("dist") <= F.lit(float(cfg.max_dist)))
        .select("url_a", "url_b", "dist", "score")
    )


def lsh_candidate_pipeline(pages_norm: DataFrame, cfg: DedupConfig) -> DataFrame:
    """signatures -> verified candidate pairs in one plan. Pair generation
    goes through the shared skew-aware join (operators/modes.py) so the
    salting tiers apply here too."""
    from py_image_dedup_spark.operators.modes import minhash_pairs

    sigs = compute_signatures(pages_norm, cfg)
    return minhash_pairs(sigs, cfg)
