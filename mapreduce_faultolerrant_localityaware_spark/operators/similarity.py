"""Similarity search over an embedding column (``array<float>``).

Two tiers, per the standard ANN playbook:
  * ann_bruteforce — exact cosine top-k: every (query, corpus) pair is
    scored.  Correctness baseline; cost O(|Q|·|C|·d).  Distributed
    shape: broadcast the (small) query set against the partitioned
    corpus, per-partition top-k via window, so the shuffle carries
    only |Q|·k·partitions candidate rows (TakeOrderedAndProject-like).
  * ann_ivf — IVF-style pruned search: score only corpus vectors in
    the query's coarse cell (here the ``label`` column stands in for a
    nearest-centroid assignment; in a real pipeline the cell id comes
    from a k-means fit).  Cost drops by the cell fan-out factor; the
    join is an equi-join on the cell id.

Vector math is built-in higher-order functions (functions.vectors) —
JVM-side, no Python in the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity


def _prep(emb: DataFrame, id_col: str, vec_col: str, extra: list[str] | None = None) -> DataFrame:
    cols = [F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")]
    cols += [F.col(c) for c in (extra or [])]
    return emb.select(*cols)


def ann_bruteforce(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``queries`` against ``emb`` (self excluded).

    Returns (query_id, neighbor_id, cos_sim) with a total tiebreak
    (sim DESC, neighbor ASC) so results are deterministic.
    """
    corpus = _prep(emb, id_col, vec_col)
    q = _prep(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        corpus.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine_similarity(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")


def ann_ivf(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-pruned cosine top-k: candidates restricted to the query's
    coarse cell (equi-join on ``cell_col``), then exact re-rank.
    ~|cells|× cheaper than brute force; recall bounded by cell quality.
    """
    corpus = _prep(emb, id_col, vec_col, [cell_col])
    q = _prep(queries, id_col, vec_col, [cell_col]).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), F.col(cell_col)
    )
    scored = (
        corpus.join(F.broadcast(q), cell_col)
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine_similarity(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")
