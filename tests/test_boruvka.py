"""Borůvka minimum spanning forest: hand-computed fixtures, the
monotone-chain election shape (long-diameter contraction), duplicate
weights under the total-order tiebreak, and a pure-Python Kruskal
cross-check on the real sf0.001 supplier—part graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_faultolerrant_localityaware_spark.operators.graph import boruvka_msf


def _msf(spark, rows):
    df = spark.createDataFrame(rows, "src long, dst long, w long")
    out = boruvka_msf(df)
    return sorted((r["src"], r["dst"], r["w"]) for r in out.collect())


def test_square_with_diagonal(spark):
    """4-cycle 1-2-3-4 with weights 1,2,3,4: MST drops the heaviest
    cycle edge (4-1, w=4)."""
    rows = [(1, 2, 1), (2, 3, 2), (3, 4, 3), (4, 1, 4)]
    assert _msf(spark, rows) == [(1, 2, 1), (2, 3, 2), (3, 4, 3)]


def test_two_components_forest(spark):
    """Disconnected input -> spanning FOREST: one tree per component."""
    rows = [(1, 2, 5), (2, 3, 1), (1, 3, 2), (10, 11, 7)]
    assert _msf(spark, rows) == [(1, 3, 2), (2, 3, 1), (10, 11, 7)]


def test_monotone_chain_elects_path(spark):
    """Increasing weights along a path: every edge is some component's
    cheapest, the election graph is one long chain — the shape that
    forces the two-phase contraction."""
    n = 40
    rows = [(i, i + 1, 100 + i) for i in range(n)]
    got = _msf(spark, rows)
    assert got == [(i, i + 1, 100 + i) for i in range(n)]


def test_duplicate_weights_deterministic(spark):
    """All weights equal: the forest is decided by the (w, a, b) total
    order — n-1 edges, bit-stable across runs."""
    rows = [(a, b, 7) for a in range(1, 5) for b in range(a + 1, 5)]
    got1 = _msf(spark, rows)
    got2 = _msf(spark, rows)
    assert got1 == got2
    assert len(got1) == 3
    # total-order tiebreak: lexicographically smallest edges win
    assert got1 == [(1, 2, 7), (1, 3, 7), (1, 4, 7)]


def test_parallel_edges_and_self_loops(spark):
    rows = [(1, 2, 9), (2, 1, 3), (1, 1, 1), (2, 3, 4)]
    assert _msf(spark, rows) == [(1, 2, 3), (2, 3, 4)]


def test_against_kruskal_on_real_graph(spark, sf_dir):
    """Total weight and edge count match a pure-Python Kruskal on the
    sf0.001 supplier—part graph (weights = min extended price cents;
    duplicate weights broken by the same (w, a, b) order)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = (
        li.select(
            F.col("l_suppkey").alias("src"),
            (F.col("l_partkey") + F.lit(20_000_000)).alias("dst"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
    )
    got = boruvka_msf(edges).collect()
    got_set = sorted((r["src"], r["dst"], r["w"]) for r in got)

    # driver-side Kruskal with identical tiebreak
    es = sorted(
        (r["w"], min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in edges.collect()
    )
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    want = []
    for w, a, b in es:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            want.append((a, b, w))
    assert len(got_set) == len(want)
    assert sum(w for _, _, w in got_set) == sum(w for _, _, w in want)
    assert got_set == sorted(want)
