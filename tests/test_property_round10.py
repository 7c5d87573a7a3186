"""Property-based pins for the round-10 rank-statistics rewrites —
the algebraic identities the scale-safe (distinct-value-collapse /
exact_ntile) forms must preserve on ARBITRARY inputs:

- exact_ntile is bit-identical to SQL ntile over the same total order
  (the core claim of the lift_table / rfm_segments / k_anonymity
  rewrite: remainder semantics, ties, both sort directions);
- Mann-Whitney U_a + U_b = n_a·n_b (computing U from either side is
  complementary — catches any rank-sum drift in the domain-collapse);
- Kendall τ-b flips sign under y → −y (antisymmetry), with
  (concordant, discordant) swapping exactly;
- RFM cell counts conserve the customer universe (Σ n_customers over
  cells = distinct custkeys);
- lift_table conserves mass (Σ bucket n = N) and its gains curve
  cum_capture is nondecreasing, ending at 1 when positives exist.

Few examples, batched rows per example — each hypothesis example
costs a Spark job, so the budget goes to input diversity, not example
count (the test_property.py discipline).
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as SF
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window

from mapreduce_faultolerrant_localityaware_spark.operators import events as ev_ops
from mapreduce_faultolerrant_localityaware_spark.operators import relational as rel

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    vals=st.lists(st.integers(min_value=0, max_value=6), min_size=1, max_size=40),
    n_tiles=st.integers(min_value=1, max_value=7),
    ascending=st.booleans(),
)
@settings(**_SETTINGS)
def test_exact_ntile_matches_sql_ntile(spark, vals, n_tiles, ascending):
    """exact_ntile == ntile(n) OVER (ORDER BY v [DESC], id) for every
    bucket count, tie pattern, and direction — including N < n_tiles
    (empty trailing buckets) and heavy straddling ties."""
    rows = [(v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "v long, id long")
    got = rel.exact_ntile(
        df, n_tiles, SF.col("v"), SF.col("id"), ascending=ascending
    )
    vo = SF.col("v").asc() if ascending else SF.col("v").desc()
    want = df.select(
        "id", SF.ntile(n_tiles).over(Window.orderBy(vo, SF.col("id").asc())).alias("b")
    )
    got_m = {r["id"]: r["bucket"] for r in got.collect()}
    want_m = {r["id"]: r["b"] for r in want.collect()}
    assert got_m == want_m


@given(
    groups=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # partition id
            st.integers(min_value=-5, max_value=5),  # value (ties likely)
        ),
        min_size=1,
        max_size=40,
    ),
    n_tiles=st.integers(min_value=1, max_value=6),
    ascending=st.booleans(),
)
@settings(**_SETTINGS)
def test_exact_ntile_partitioned_matches_per_group_sql_ntile(
    spark, groups, n_tiles, ascending
):
    """The stacked form (round-11 optimization: rfm_segments' one-pass
    three-metric scoring): exact_ntile with ``partition_cols`` must be
    bit-identical to ntile(n) OVER (PARTITION BY g ORDER BY v [DESC],
    id) — each group's N, remainder arithmetic and straddle ranks are
    independent."""
    rows = [(g, v, i) for i, (g, v) in enumerate(groups)]
    df = spark.createDataFrame(rows, "g long, v long, id long")
    got = rel.exact_ntile(
        df,
        n_tiles,
        SF.col("v"),
        SF.col("id"),
        ascending=ascending,
        partition_cols=["g"],
    )
    vo = SF.col("v").asc() if ascending else SF.col("v").desc()
    want = df.select(
        "id",
        SF.ntile(n_tiles)
        .over(Window.partitionBy("g").orderBy(vo, SF.col("id").asc()))
        .alias("b"),
    )
    got_m = {r["id"]: r["bucket"] for r in got.collect()}
    want_m = {r["id"]: r["b"] for r in want.collect()}
    assert got_m == want_m


@given(
    a_vals=st.lists(st.integers(min_value=0, max_value=8), min_size=1, max_size=20),
    b_vals=st.lists(st.integers(min_value=0, max_value=8), min_size=1, max_size=20),
)
@settings(**_SETTINGS)
def test_mannwhitney_u_complement(spark, a_vals, b_vals):
    """U_a + U_b = n_a·n_b: running the test with the groups swapped
    must produce the complementary U (ties included — both U's carry
    the same average-rank mass)."""
    rows = [("a", float(v)) for v in a_vals] + [("b", float(v)) for v in b_vals]
    df = spark.createDataFrame(rows, "g string, v double")
    r_ab = ev_ops.mannwhitney_u(df, "g", "v", "a", "b").collect()[0]
    r_ba = ev_ops.mannwhitney_u(df, "g", "v", "b", "a").collect()[0]
    assert (r_ab["n_a"], r_ab["n_b"]) == (len(a_vals), len(b_vals))
    assert r_ab["u_a"] + r_ba["u_a"] == pytest.approx(
        len(a_vals) * len(b_vals), abs=1e-9
    )


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=-20, max_value=20),
            st.integers(min_value=-20, max_value=20),
        ),
        min_size=3,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_kendall_tau_sign_flip_antisymmetry(spark, pts):
    """τ-b(x, −y) = −τ-b(x, y); concordant/discordant counts swap."""
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    neg = [(i, x, -y) for i, (x, y) in enumerate(pts)]
    d1 = spark.createDataFrame(rows, "t long, x long, y long")
    d2 = spark.createDataFrame(neg, "t long, x long, y long")
    r1 = ev_ops.kendall_tau(d1, "t", "x", "y").collect()[0]
    r2 = ev_ops.kendall_tau(d2, "t", "x", "y").collect()[0]
    assert (r1["concordant"], r1["discordant"]) == (
        r2["discordant"],
        r2["concordant"],
    )
    if r1["tau_b"] is None:
        assert r2["tau_b"] is None  # constant x or y: both NULL
    else:
        assert r1["tau_b"] == pytest.approx(-r2["tau_b"], abs=2e-6)


@given(
    orders=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=12),  # custkey (few: tied metrics)
            st.integers(min_value=0, max_value=400),  # day offset
            st.integers(min_value=1, max_value=9999),  # price cents/100
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_rfm_cell_counts_conserve_customers(spark, orders):
    """Σ n_customers over (R,F,M) cells = |distinct custkeys|, and
    every score sits in [1, n_tiles]."""
    base = dt.date(1995, 1, 1)
    rows = [
        (c, base + dt.timedelta(days=d), cents / 100.0) for c, d, cents in orders
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate date, o_totalprice double"
    )
    cells = rel.rfm_segments(df).collect()
    n_cust = len({c for c, _, _ in orders})
    assert sum(r["n_customers"] for r in cells) == n_cust
    for r in cells:
        for col in ("r_score", "f_score", "m_score"):
            assert 1 <= r[col] <= 5


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # score (ties likely)
            st.booleans(),  # label
        ),
        min_size=1,
        max_size=60,
    ),
    n_bins=st.integers(min_value=2, max_value=10),
)
@settings(**_SETTINGS)
def test_lift_table_mass_and_monotone_capture(spark, data, n_bins):
    """Σ bucket n = N; cum_capture is nondecreasing in bucket order
    and reaches 1.0 on the last bucket when any positive exists."""
    rows = [(i, v, int(y)) for i, (v, y) in enumerate(data)]
    df = spark.createDataFrame(rows, "id long, v long, y long")
    out = ev_ops.lift_table(
        df, SF.col("v"), SF.col("y"), SF.col("id"), n_bins=n_bins
    ).orderBy("bucket").collect()
    assert sum(r["n"] for r in out) == len(data)
    caps = [r["cum_capture"] for r in out]
    n_pos = sum(1 for _, y in data if y)
    if n_pos == 0:
        assert all(c is None for c in caps)
    else:
        assert all(c is not None for c in caps)
        assert all(a <= b + 1e-9 for a, b in zip(caps, caps[1:]))
        assert caps[-1] == pytest.approx(1.0, abs=1e-6)


@given(
    data=st.lists(
        st.tuples(st.integers(min_value=0, max_value=2),
                  st.integers(min_value=-50, max_value=50)),
        min_size=6, max_size=40,
    ).filter(lambda d: len({g for g, _ in d}) >= 2),
    scale=st.sampled_from([2, 5, 10]),
)
@settings(**_SETTINGS)
def test_anova_f_scale_and_shift_invariant(spark, data, scale):
    """F is invariant under y → a·y + b (both SS scale by a²; the
    shift cancels in every centered moment) — catches any lost
    centering or mixed-unit bug in the moment pipeline."""
    df1 = spark.createDataFrame([(str(g), float(v)) for g, v in data], "g string, v double")
    df2 = spark.createDataFrame(
        [(str(g), float(v * scale + 7)) for g, v in data], "g string, v double"
    )
    r1 = ev_ops.anova_oneway(df1, "g", "v").collect()[0]
    r2 = ev_ops.anova_oneway(df2, "g", "v").collect()[0]
    assert r1["n"] == r2["n"] and r1["k_groups"] == r2["k_groups"]
    if r1["f_stat"] is None:
        assert r2["f_stat"] is None
    else:
        assert abs(r1["f_stat"] - r2["f_stat"]) < 1e-3
        assert abs(r1["eta_sq"] - r2["eta_sq"]) < 1e-6


@given(
    data=st.lists(
        st.tuples(st.integers(min_value=1, max_value=4),
                  st.booleans()),
        min_size=4, max_size=60,
    ).filter(lambda d: len({s for s, _ in d}) >= 2
             and 0 < sum(f for _, f in d) < len(d)),
)
@settings(**_SETTINGS)
def test_cochran_armitage_score_flip_antisymmetry(spark, data):
    """Reversing the score order (s → −s) must exactly negate the
    trend z — the N-scaled integer numerator is odd in the scores and
    the variance is even."""
    df1 = spark.createDataFrame([(s, int(f)) for s, f in data], "s long, f long")
    df2 = spark.createDataFrame([(-s, int(f)) for s, f in data], "s long, f long")
    z1 = ev_ops.cochran_armitage(df1, "s", "f").collect()[0]["z_stat"]
    z2 = ev_ops.cochran_armitage(df2, "s", "f").collect()[0]["z_stat"]
    assert z1 is not None and z2 is not None
    assert abs(z1 + z2) < 1e-9


@given(
    data=st.lists(
        st.tuples(st.integers(min_value=0, max_value=2),
                  st.integers(min_value=-20, max_value=20)),
        min_size=6, max_size=40,
    ).filter(lambda d: len({g for g, _ in d}) >= 2),
)
@settings(**_SETTINGS)
def test_kruskal_h_monotone_transform_invariant(spark, data):
    """H depends only on ranks, so any strictly monotone value
    transform (here v → 3v + 1) leaves it EXACTLY unchanged — the
    doubled-rank integers are identical, not merely close."""
    df1 = spark.createDataFrame([(str(g), float(v)) for g, v in data], "g string, v double")
    df2 = spark.createDataFrame(
        [(str(g), float(3 * v + 1)) for g, v in data], "g string, v double"
    )
    h1 = ev_ops.kruskal_wallis(df1, "g", "v").collect()[0]["h_stat"]
    h2 = ev_ops.kruskal_wallis(df2, "g", "v").collect()[0]["h_stat"]
    assert (h1 is None) == (h2 is None)
    if h1 is not None:
        assert abs(h1 - h2) < 1e-9
