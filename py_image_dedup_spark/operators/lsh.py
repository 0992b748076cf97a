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


def variant_sig_cols(columns, cfg: DedupConfig) -> tuple:
    """Variant signature columns PRESENT in `columns`, in cfg order.

    Name-keyed (sig_v_<variant>, not positional sig_v0/sig_v1) so a
    signatures checkpoint or store built under one variant list can never
    be silently re-verified under a DIFFERENT variant's semantics on
    resume — a renamed variant simply doesn't match and the mode falls
    back to the canonical signature, which is an auditable degradation,
    not a wrong answer (ADVICE r5)."""
    return tuple(
        f"sig_v_{name}" for name in cfg.norm_variants
        if f"sig_v_{name}" in columns
    )


def explode_bands(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(url, sig[, sig_v_<variant>..]) -> (url, band_id, band_hash). band_hash =
    xxhash64 over the band's signature slice + band index; computed
    JVM-side via transform + posexplode — no Python.

    With cfg.norm_variants, each variant signature column contributes its
    own lsh_bands band rows; posexplode over the concatenated band arrays
    assigns globally distinct band_ids (variant v occupies
    [v*lsh_bands, (v+1)*lsh_bands)), so variant streams bucket separately
    inside the SAME self-join — no extra shuffle, just ~(1+v)x band rows."""
    r = cfg.lsh_rows

    def band_arr(sig_col: str):
        return F.transform(
            F.sequence(F.lit(0), F.lit(cfg.lsh_bands - 1)),
            lambda i: F.xxhash64(F.slice(F.col(sig_col), i * r + 1, r), i),
        )

    sig_cols = ["sig", *variant_sig_cols(signatures.columns, cfg)]
    arrs = [band_arr(c) for c in sig_cols]
    bands = F.concat(*arrs) if len(arrs) > 1 else arrs[0]
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
                 cfg: DedupConfig, broadcast_pairs: bool = False,
                 key: str = "url",
                 sig_cols: tuple = ("sig",)) -> DataFrame:
    """Exact re-check at the signature level: dist = 1 - estimated Jaccard
    (fraction of agreeing positions); keep dist <= max_dist. Mirrors the
    reference's distance_cutoff filter (elasticsearchstorebackend.py:55,86).

    `key` names the pair-join key: "url" (streaming path) or "uid" — the
    compact 8-byte xxhash64(url) the batch band join shuffles instead of
    url strings (operators/modes.py:_capped_self_join). For key="uid" the
    signature probe recovers url alongside sig, so the output is always
    url pairs, canonicalized url_a < url_b.

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
    ka, kb = f"{key}_a", f"{key}_b"
    cols = list(sig_cols)
    if key == "url":
        sigs = signatures.select("url", *cols)
        sa = sigs.select(F.col("url").alias(ka),
                         *[F.col(c).alias(f"{c}_a") for c in cols])
        sb = sigs.select(F.col("url").alias(kb),
                         *[F.col(c).alias(f"{c}_b") for c in cols])
    else:
        sigs = signatures.withColumn(key, F.xxhash64("url")).select(
            key, "url", *cols
        )
        sa = sigs.select(
            F.col(key).alias(ka), F.col("url").alias("url_a"),
            *[F.col(c).alias(f"{c}_a") for c in cols],
        )
        sb = sigs.select(
            F.col(key).alias(kb), F.col("url").alias("url_b"),
            *[F.col(c).alias(f"{c}_b") for c in cols],
        )
    if broadcast_pairs:
        ja = sa.join(F.broadcast(pairs.select(ka, kb, "score")), ka)
        jb = sb.join(F.broadcast(pairs.select(ka, kb)), kb)
        joined = ja.join(jb, [ka, kb])
    else:
        joined = pairs.join(sa, ka).join(sb, kb)
    # dist = MIN across normalization variants (the reference's best-
    # orientation semantic: a duplicate under ANY canonical form matches)
    dists = [
        F.lit(1.0) - est_jaccard_col(F.col(f"{c}_a"), F.col(f"{c}_b"))
        for c in cols
    ]
    dist = F.least(*dists) if len(dists) > 1 else dists[0]
    return (
        joined.withColumn("dist", dist)
        .where(F.col("dist") <= F.lit(float(cfg.max_dist)))
        .select(
            F.least("url_a", "url_b").alias("url_a"),
            F.greatest("url_a", "url_b").alias("url_b"),
            "dist", "score",
        )
    )


def resolve_pair_urls(pairs: DataFrame, signatures: DataFrame,
                      broadcast_pairs: bool = False,
                      dist: float = 0.0) -> DataFrame:
    """(uid_a, uid_b, score) -> (url_a, url_b, dist, score) with a CONSTANT
    dist — the full-band-agreement short-circuit target (operators/modes.py
    minhash_pairs): pairs whose score equals cfg.lsh_bands matched in every
    band, so every signature slice is equal (an xxhash64 slice collision in
    ALL bands at once is ~2^-64·per-band — and would only emit an extra
    dist-0 pair, the same conservative direction as a uid collision), est
    Jaccard is exactly 1 and dist exactly 0 — verification always passes.
    These are the DENSEST pairs (most-duplicated content), so skipping the
    sig-carrying probes for them cuts the verify stage's shuffle bytes
    where they concentrate; this join moves only (uid, url) rows.

    Same two physical shapes as verify_pairs, picked by the caller from
    the measured pair count."""
    ma = signatures.select(
        F.xxhash64("url").alias("uid_a"), F.col("url").alias("url_a")
    )
    mb = signatures.select(
        F.xxhash64("url").alias("uid_b"), F.col("url").alias("url_b")
    )
    if broadcast_pairs:
        ja = ma.join(F.broadcast(pairs.select("uid_a", "uid_b", "score")),
                     "uid_a")
        jb = mb.join(F.broadcast(pairs.select("uid_a", "uid_b")), "uid_b")
        joined = ja.join(jb, ["uid_a", "uid_b"])
    else:
        joined = pairs.join(ma, "uid_a").join(mb, "uid_b")
    return joined.select(
        F.least("url_a", "url_b").alias("url_a"),
        F.greatest("url_a", "url_b").alias("url_b"),
        F.lit(float(dist)).alias("dist"),
        "score",
    )


def lsh_candidate_pipeline(pages_norm: DataFrame, cfg: DedupConfig) -> DataFrame:
    """signatures -> verified candidate pairs in one plan. Pair generation
    goes through the shared skew-aware join (operators/modes.py) so the
    salting tiers apply here too."""
    from py_image_dedup_spark.operators.modes import (
        minhash_pairs,
        minhash_signatures,
    )

    sigs = minhash_signatures(pages_norm, cfg)  # + cfg.norm_variants sigs
    return minhash_pairs(sigs, cfg)
