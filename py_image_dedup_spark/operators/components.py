"""Distributed connected components over the candidate-pair edge list.

Supersedes the reference's order-dependent sequential clustering
(py_image_dedup/library/deduplicator.py:315-359: visited-set + 2-hop
re-query from the best candidate) with true transitive closure — every url
gets exactly one cluster_id = min(url) of its component, order-independent
and embarrassingly parallel (SURVEY.md §2.4 A2).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the edge set is
repeatedly rewired toward component minima until it is a union of 2-level
stars rooted at each component's minimum:

  large-star(u): with m = min(neighbors(u) ∪ {u}), re-point every neighbor
                 v > u at m  — halves long chains
  small-star(u): over edges oriented larger→smaller, with m = min(smaller
                 neighbors ∪ {u}), point u and its smaller neighbors at m
                 — flattens partial stars

This converges in O(log n) rounds on ANY graph — including the adversarial
web-scale shapes (giant template/hub components, long chains) where plain
min-label propagation needs O(diameter) rounds. Each half-round is one
aggregation + one join (two shuffles) with localCheckpoint to cut lineage
(SURVEY.md §4 item 3). Convergence detection is an O(1)-result XOR
signature of the freshly checkpointed edge set — no join-with-previous.

Scale guard: `max_iterations` bounds runaway rounds; non-convergence is
reported via `stats`, and the partial edges still only over-split, never
merge wrongly (the final min-aggregation keeps labels consistent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Unique undirected edges as (u = min endpoint, v = max endpoint)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a") != F.col("b")
    )
    return e.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).distinct()


def _sig(frame: DataFrame) -> tuple:
    """Order-independent signature of the edge set (XOR of per-row hashes
    over unique rows + count). False convergence needs a 2^-64-scale
    collision between consecutive rounds."""
    row = frame.agg(
        F.bit_xor(F.xxhash64("u", "v")).alias("s"), F.count("*").alias("c")
    ).first()
    return (row["s"], row["c"])


def _large_star(e: DataFrame) -> DataFrame:
    """Emit (m(u), v) for every neighbor v > u; m(u) = min(Γ(u) ∪ {u}).
    Output stays canonical: m(u) <= u < v."""
    adj = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        adj.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", F.col("u")).alias("m"))
    )
    return (
        adj.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("m").alias("u"), F.col("v").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Over edges oriented larger→smaller (big = v-side of canonical form):
    with m = min(smaller neighbors), point the big node and its other
    smaller neighbors at m. Output canonical: m < y."""
    big = e.select(F.col("v").alias("u"), F.col("u").alias("v"))  # u big
    mins = big.groupBy("u").agg(F.min("v").alias("m"))  # all v < u
    neigh = big.join(mins, "u").select(F.col("v").alias("y"), "m")
    selfe = mins.select(F.col("u").alias("y"), "m")
    return (
        neigh.union(selfe)
        .where(F.col("y") != F.col("m"))
        .select(F.col("m").alias("u"), F.col("y").alias("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "url_a",
    dst: str = "url_b",
    vertex_col: str = "url",
    max_iterations: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """edges(src,dst) [+ vertices(vertex_col)] -> (url, cluster_id).

    cluster_id = min vertex of the component. Vertices absent from any edge
    become singleton clusters (cluster_id = own vertex) if a vertices frame
    is supplied. `stats`, if given, receives {"rounds": n, "converged": b}.
    """
    # lazy localCheckpoint: the _sig probe is the materializing action, so
    # each round costs exactly ONE job (driver job-launch latency is serial
    # at any cluster size — it directly caps N->4N scaling efficiency)
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=False)

    prev = _sig(e)
    rounds = 0
    converged = prev[1] == 0  # no edges: nothing to do
    while not converged and rounds < max_iterations:
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        rounds += 1
        cur = _sig(e)
        if cur == prev:
            converged = True
        prev = cur
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged

    # converged edge set is a union of stars (u = component min, v = member);
    # the min-agg also keeps labels consistent on a non-converged partial
    out = (
        e.select(F.col("v").alias(vertex_col), F.col("u").alias("cluster_id"))
        .union(
            e.select(F.col("u").alias(vertex_col))
            .distinct()
            .withColumn("cluster_id", F.col(vertex_col))
        )
        .groupBy(vertex_col)
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    if vertices is not None:
        singles = vertices.select(vertex_col).join(
            out.select(vertex_col), vertex_col, "left_anti"
        ).withColumn("cluster_id", F.col(vertex_col))
        out = out.union(singles)
    return out
