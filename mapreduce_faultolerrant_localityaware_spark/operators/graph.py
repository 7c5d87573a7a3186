"""Iterative graph operator: connected components over a pair list —
the endgame of near-dup detection (candidate pairs → duplicate
CLUSTERS, one representative per cluster).

The reference has no iterative operators (single-shot batch, SURVEY
§1.4); this is the canonical Spark-idiomatic iteration: a driver loop
of DataFrame joins with ``localCheckpoint`` truncating the lineage
each round so the plan doesn't grow unboundedly (the classic iterative
-algorithm failure mode).

Scale shape: min-label propagation converges in O(graph diameter)
rounds, each round one shuffle of the edge list + one of the label
table.  Near-dup graphs are overwhelmingly tiny cliques and chains
(diameter ≤ ~3), so 5–10 rounds close ~all real corpora; ``max_iter``
bounds the pathological chain.  For billion-edge general graphs you'd
switch to alternating small-star/large-star (O(log n) rounds, same
join primitives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(src, dst) undirected edge list → (id, cluster_id) where
    cluster_id is the minimum node id reachable from ``id``.

    Only nodes that appear in at least one edge are returned
    (singletons have no duplicates to cluster).
    """
    fwd = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    rev = pairs.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    edges = fwd.unionByName(rev).distinct().localCheckpoint(eager=True)

    labels = edges.select(F.col("a").alias("id")).distinct().withColumn("label", F.col("id"))

    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("id").alias("b"), F.col("label").alias("nbr_label")), "b"
            )
            .groupBy("a")
            .agg(F.min("nbr_label").alias("min_nbr"))
        )
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.a, "left")
            .select(
                labels.id,
                F.least(labels.label, F.coalesce(F.col("min_nbr"), labels.label)).alias("label"),
            )
            .localCheckpoint(eager=True)  # truncate lineage every round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))
