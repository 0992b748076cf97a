"""Distributed connected components over the candidate-pair edge list.

Supersedes the reference's order-dependent sequential clustering
(py_image_dedup/library/deduplicator.py:315-359: visited-set + 2-hop
re-query from the best candidate) with true transitive closure — every url
gets exactly one cluster_id = min(url) of its component, order-independent
and embarrassingly parallel (SURVEY.md §2.4 A2).

Algorithm: iterative min-label propagation. labels(n) = min over
{n} ∪ neighbors' labels, repeated to fixpoint. Converges in O(diameter)
rounds; near-dup components are shallow (variant fans around an original),
so diameter is small. Each round: one join + one aggregation (two shuffles),
with localCheckpoint() per round to cut lineage (SURVEY.md §4 item 3).
Convergence detection rides on the same aggregation via a changed-count
accumulation — no extra action beyond one count per round.

Scale guard: `max_iterations` bounds runaway chains (giant template
components); non-convergence is reported, and the partial labels are still
a valid refinement (only over-splits, never merges wrongly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "url_a",
    dst: str = "url_b",
    vertex_col: str = "url",
    max_iterations: int = 25,
) -> DataFrame:
    """edges(src,dst) [+ vertices(vertex_col)] -> (url, cluster_id).

    cluster_id = lexicographic min url of the component. Vertices absent
    from any edge become singleton clusters (cluster_id = own url) if a
    vertices frame is supplied.
    """
    sym = (
        edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
        .union(edges.select(F.col(dst).alias("n"), F.col(src).alias("m")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("n")).distinct().withColumn("label", F.col("n"))
    ).localCheckpoint(eager=True)

    # convergence detector: order-independent signature of the label set
    # (XOR of per-row hashes — rows are unique (n, label) pairs, and XOR
    # can't overflow under ANSI mode). One cheap scan of the freshly
    # checkpointed frame per round instead of a join-with-previous —
    # the join dominated wall-clock on shallow graphs. False convergence
    # needs a 2^-64-scale collision *between consecutive rounds*.
    def _sig(frame: DataFrame) -> tuple:
        row = frame.agg(
            F.bit_xor(F.xxhash64("n", "label")).alias("s"),
            F.count("*").alias("c"),
        ).first()
        return (row["s"], row["c"])

    prev = _sig(labels)
    for _ in range(max_iterations):
        # candidate label for n: min(own label, labels of neighbors)
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("n", "m"), "m")
            .select("n", "label")
        )
        new_labels = (
            labels.union(neighbor_labels)
            .groupBy("n")
            .agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)

        cur = _sig(new_labels)
        labels = new_labels
        if cur == prev:
            break
        prev = cur

    out = labels.select(F.col("n").alias(vertex_col), F.col("label").alias("cluster_id"))
    if vertices is not None:
        singles = vertices.select(vertex_col).join(
            out.select(vertex_col), vertex_col, "left_anti"
        ).withColumn("cluster_id", F.col(vertex_col))
        out = out.union(singles)
    return out
