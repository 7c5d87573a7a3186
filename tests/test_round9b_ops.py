"""Round-9b operator exactness pins: survival analysis, rank tests,
CUPED, concentration, and cohort economics — each new operator checked
against a small hand-computed example (the oracle gate verifies parity
with DuckDB; these pin the MATH itself on inputs tiny enough to verify
by hand, the reference's sequential-oracle pattern,
test/genSequentiallyTokens.go:29-45).
"""

import datetime as dt
import math

import pytest

from mapreduce_faultolerrant_localityaware_spark.operators import events as ev_ops
from mapreduce_faultolerrant_localityaware_spark.operators import relational as rel


def _d(day):
    return dt.datetime(2024, 1, day)


def test_survival_km_hand_example(spark):
    """4 users: lifetimes 0,1,1,3 days; corpus max = day 9; horizon 2.
    Users with last event day 9-2=7 or later are censored.
      u1: d1..d1 (t=0, last 1, dead)   u2: d1..d2 (t=1, dead)
      u3: d2..d3 (t=1, dead)           u4: d6..d9 (t=3, censored)
    Steps: t=0: n=4,d=1, S=3/4; t=1: n=3,d=2, S=3/4*1/3=1/4.
    t=3 is censored-only (d=0) -> no step row."""
    rows = [
        (1, _d(1)), (2, _d(1)), (2, _d(2)), (3, _d(2)), (3, _d(3)),
        (4, _d(6)), (4, _d(9)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["t"]: r for r in ev_ops.survival_km(df, horizon_days=2).collect()}
    assert set(out) == {0, 1}
    assert (out[0]["n_risk"], out[0]["n_events"]) == (4, 1)
    assert (out[1]["n_risk"], out[1]["n_events"]) == (3, 2)
    assert out[0]["survival"] == pytest.approx(0.75, abs=1e-5)
    assert out[1]["survival"] == pytest.approx(0.25, abs=1e-5)


def test_survival_km_terminal_full_death_is_zero(spark):
    """All users at the last step churn: survival hits exactly 0.0
    (the d = n_risk short-circuit), never ln(0)."""
    rows = [(1, _d(1)), (2, _d(1)), (2, _d(2)), (9, _d(20))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sorted(
        ev_ops.survival_km(df, horizon_days=2).collect(), key=lambda r: r["t"]
    )
    # u9 (t=0) is censored (last=max); u1 t=0 dead, u2 t=1 dead (last step)
    last = out[-1]
    assert last["n_events"] == last["n_risk"]
    assert last["survival"] == 0.0


def test_mannwhitney_hand_example(spark):
    """a = {1,2,3}, b = {4,5,6} (cents 100..600, no ties):
    all b above all a -> U_a = 0, R_a = 1+2+3 = 6.
    z = (0 - 4.5) / sqrt(3*3*7/12) = -4.5/sqrt(5.25)."""
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ev_ops.mannwhitney_u(df, "g", "v", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["u_a"] == 0.0
    assert r["z_stat"] == pytest.approx(-4.5 / math.sqrt(5.25), abs=1e-6)


def test_mannwhitney_all_tied_is_null(spark):
    """Every value identical: tie correction kills the variance ->
    z NULL (not a crash); U_a = n1*n2/2 exactly."""
    rows = [("a", 7.0), ("a", 7.0), ("b", 7.0), ("b", 7.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ev_ops.mannwhitney_u(df, "g", "v", "a", "b").collect()[0]
    assert r["u_a"] == 2.0  # 2*2/2
    assert r["z_stat"] is None


def test_cuped_theta_and_lift(spark):
    """Perfectly correlated x,y (y = 2x): theta = 2, var_reduction = 1,
    and the CUPED lift removes exactly the pre-period imbalance.
    mid splits jan1..jan4 at jan2-12:00; x = value on jan1/jan2,
    y = value on jan3/jan4."""
    rows = [
        # user 0 (arm a): x=10, y=20 ; user 2 (arm a): x=30, y=60
        (0, _d(1), 10.0), (0, _d(3), 20.0),
        (2, _d(2), 30.0), (2, _d(4), 60.0),
        # user 1 (arm b): x=20, y=40 ; user 3 (arm b): x=40, y=80
        (1, _d(1), 20.0), (1, _d(3), 40.0),
        (3, _d(2), 40.0), (3, _d(4), 80.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    r = ev_ops.cuped_adjust(df).collect()[0]
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert r["theta"] == pytest.approx(2.0, abs=1e-6)
    assert r["var_reduction"] == pytest.approx(1.0, abs=1e-6)
    # raw lift = (40+80)/2 - (20+60)/2 = 20; x-imbalance = 30-20 = 10;
    # cuped = 20 - 2*10 = 0 (y = 2x exactly -> adjusted lift vanishes)
    assert r["lift_raw"] == pytest.approx(20.0, abs=1e-6)
    assert r["lift_cuped"] == pytest.approx(0.0, abs=1e-6)


def test_runs_test_alternating_series(spark):
    """Perfectly alternating above/below-median signs: every step is a
    new run -> R = n, z strongly positive; counts exact."""
    rows = [(_d(i + 1), 10 if i % 2 == 0 else 1) for i in range(10)]
    df = spark.createDataFrame(rows, "d timestamp, n long")
    r = ev_ops.runs_test(df, "d", "n").collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (5, 5)
    assert r["n_runs"] == 10
    mu = 1 + 2 * 25 / 10
    var = 2 * 25 * (50 - 10) / (100 * 9)
    assert r["z_stat"] == pytest.approx((10 - mu) / math.sqrt(var), abs=1e-6)


def test_runs_test_median_days_excluded(spark):
    """Days AT the median carry no sign and are excluded from both
    the counts and the run sequence."""
    rows = [(_d(1), 1), (_d(2), 2), (_d(3), 2), (_d(4), 2), (_d(5), 9)]
    df = spark.createDataFrame(rows, "d timestamp, n long")
    r = ev_ops.runs_test(df, "d", "n").collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (1, 1)
    assert r["n_runs"] == 2


def test_gini_known_distributions(spark):
    """Uniform values -> G = (n-1)/(3n)? No: equal values -> G = 0;
    one-holds-all -> G = (n-1)/n."""
    rows = [("eq", i, 100) for i in range(1, 5)] + [
        ("one", 1, 0), ("one", 2, 0), ("one", 3, 0), ("one", 4, 1000),
    ]
    df = spark.createDataFrame(rows, "g string, id long, cents long")
    out = {r["g"]: r for r in rel.gini_index(df, "g", "id", "cents").collect()}
    assert out["eq"]["gini"] == pytest.approx(0.0, abs=1e-6)
    assert out["one"]["gini"] == pytest.approx(0.75, abs=1e-6)  # (n-1)/n
    assert out["one"]["total_cents"] == 1000


def test_gini_zero_total_is_null(spark):
    df = spark.createDataFrame(
        [("z", 1, 0), ("z", 2, 0)], "g string, id long, cents long"
    )
    assert rel.gini_index(df, "g", "id", "cents").collect()[0]["gini"] is None


def test_cohort_ltv_hand_example(spark):
    """Two cohorts: jan users {1,2} spend 10 in jan + 20 in feb;
    feb user {3} spends 5.  LTV(jan, age 0) = 10/2, (jan, age 1) =
    30/2; (feb-cohort, age 0) = 5/1."""
    rows = [
        (1, dt.datetime(2024, 1, 5), 4.0), (2, dt.datetime(2024, 1, 9), 6.0),
        (1, dt.datetime(2024, 2, 5), 20.0),
        (3, dt.datetime(2024, 2, 7), 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        (r["cohort_idx"], r["age_months"]): r for r in ev_ops.cohort_ltv(df).collect()
    }
    jan = 2024 * 12 + 1
    assert out[(jan, 0)]["ltv_per_user"] == pytest.approx(5.0, abs=1e-6)
    assert out[(jan, 1)]["ltv_per_user"] == pytest.approx(15.0, abs=1e-6)
    assert out[(jan + 1, 0)]["ltv_per_user"] == pytest.approx(5.0, abs=1e-6)
    assert out[(jan, 1)]["cum_revenue_cents"] == 3000


def test_rfm_deterministic_buckets(spark):
    """10 customers, distinct metrics: ntile(5) puts exactly 2 per
    bucket, and the best (most recent, most frequent, biggest spender)
    customer lands in (5,5,5)."""
    rows = []
    for c in range(1, 11):
        # customer c: c orders on days 1..c, each worth c dollars
        for k in range(1, c + 1):
            rows.append((c, dt.datetime(2024, 1, k), float(c)))
    df = spark.createDataFrame(rows, "o_custkey long, o_orderdate timestamp, o_totalprice double")
    out = rel.rfm_segments(df).collect()
    total = sum(r["n_customers"] for r in out)
    assert total == 10
    best = [r for r in out if (r["r_score"], r["f_score"], r["m_score"]) == (5, 5, 5)]
    # customers 9 and 10 are the top-2 on every metric
    assert best and best[0]["n_customers"] == 2
    assert best[0]["avg_monetary"] == pytest.approx((9 * 9 + 10 * 10) / 2, abs=1e-6)


def test_theil_sen_hand_example(spark):
    """Series (t, v) = (0,0),(1,10),(2,14),(3,100): slopes 10,7,33.33,
    4,45,86 -> micro-slopes sorted [4e6,7e6,1e7,33333333,45e6,86e6];
    lower median (rank 3 of 6) = 1e7 -> slope 10.0."""
    rows = [("a", 0, 0), ("a", 1, 10), ("a", 2, 14), ("a", 3, 100)]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    r = ev_ops.theil_sen(df, "k", "t", "v").collect()[0]
    assert (r["n_points"], r["n_pairs"]) == (4, 6)
    assert r["slope"] == pytest.approx(10.0, abs=1e-6)


def test_theil_sen_negative_slope_floor(spark):
    """Negative non-exact slope floors (never truncates): two points
    (0, 1), (3, 0) -> slope -1/3 -> micro-slope floor(-1000000/3) =
    -333334 -> -0.333334 (not the truncated -0.333333)."""
    rows = [("a", 0, 1), ("a", 3, 0)]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    r = ev_ops.theil_sen(df, "k", "t", "v").collect()[0]
    assert r["slope"] == pytest.approx(-0.333334, abs=1e-9)


def test_ewma_constant_and_step(spark):
    """Constant series: ewma == the constant at every row.  After a
    step 0->16 the smoother converges geometrically from below."""
    rows = [(_d(i + 1), 5) for i in range(20)]
    df = spark.createDataFrame(rows, "d timestamp, n long")
    out = ev_ops.ewma_smooth(df, "d", "n").collect()
    assert all(r["ewma"] == pytest.approx(5.0, abs=1e-6) for r in out)
    rows2 = [(_d(i + 1), 0 if i < 10 else 16) for i in range(20)]
    df2 = spark.createDataFrame(rows2, "d timestamp, n long")
    out2 = sorted(ev_ops.ewma_smooth(df2, "d", "n").collect(), key=lambda r: r["d"])
    vals = [r["ewma"] for r in out2]
    assert vals[9] == pytest.approx(0.0, abs=1e-6)
    assert 0 < vals[10] < vals[12] < vals[19] <= 16.0


def test_kendall_tau_perfect_and_reversed(spark):
    """Strictly increasing y with x: tau = 1; reversed: tau = -1."""
    inc = [(i, i, i * 2) for i in range(1, 8)]
    dec = [(i, i, 100 - i) for i in range(1, 8)]
    d1 = spark.createDataFrame(inc, "t long, x long, y long")
    d2 = spark.createDataFrame(dec, "t long, x long, y long")
    r1 = ev_ops.kendall_tau(d1, "t", "x", "y").collect()[0]
    r2 = ev_ops.kendall_tau(d2, "t", "x", "y").collect()[0]
    assert r1["tau_b"] == pytest.approx(1.0, abs=1e-6)
    assert (r1["concordant"], r1["discordant"]) == (21, 0)
    assert r2["tau_b"] == pytest.approx(-1.0, abs=1e-6)


def test_kendall_tau_constant_series_null(spark):
    rows = [(i, 5, i) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "t long, x long, y long")
    assert ev_ops.kendall_tau(df, "t", "x", "y").collect()[0]["tau_b"] is None


def test_mh_odds_ratio_simpsons_paradox(spark):
    """Classic confounding: within each stratum OR = 1 (exposure has
    no effect), but stratum sizes couple exposure and outcome so the
    crude OR > 1; MH recovers ~1."""
    import pyspark.sql.functions as SF

    rows = []
    # stratum s1: mostly exposed, high base rate (OR inside = 1)
    rows += [("s1", 1, 1)] * 80 + [("s1", 1, 0)] * 20
    rows += [("s1", 0, 1)] * 8 + [("s1", 0, 0)] * 2
    # stratum s2: mostly unexposed, low base rate (OR inside = 1)
    rows += [("s2", 1, 1)] * 2 + [("s2", 1, 0)] * 8
    rows += [("s2", 0, 1)] * 20 + [("s2", 0, 0)] * 80
    df = spark.createDataFrame(rows, "stratum string, e int, o int")
    r = ev_ops.mh_odds_ratio(
        df, "stratum", SF.col("e") == 1, SF.col("o") == 1
    ).collect()[0]
    assert r["n_strata"] == 2
    assert r["or_mh"] == pytest.approx(1.0, abs=1e-6)
    assert r["or_crude"] > 2.0  # confounded crude estimate


def test_attribution_negative_refund_matches_duckdb_oracle():
    """The r8-advice divergence class, pinned CROSS-ENGINE with a
    refund (negative conversion value): floor(-7000*1000/3) =
    -2333334 milli-cents per touch on BOTH engines (DuckDB's integer
    `//` truncates toward zero — verified -7//3 = -2 — so the oracle
    carries the explicit -1 floor correction)."""
    import duckdb

    import __spark_entry__ as entry_mod
    from mapreduce_faultolerrant_localityaware_spark.session import get_spark

    spark = get_spark("tests", shuffle_partitions=8)
    rows = [
        # one purchase of -70.00 (refund), three prior touches
        (1, dt.datetime(2024, 1, 10), 100, "purchase", -70.0, None),
        (2, dt.datetime(2024, 1, 9), 100, "view", 0.0, None),
        (3, dt.datetime(2024, 1, 8), 100, "click", 0.0, None),
        (4, dt.datetime(2024, 1, 7), 100, "view", 0.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {
        r["channel"]: r["linear_value"]
        for r in ev_ops.attribution_multi_touch(df).collect()
    }
    # floor(-7000000/3) = -2333334 mc; view gets 2 touches, click 1
    assert got["view"] == pytest.approx(-46.66668, abs=1e-6)
    assert got["click"] == pytest.approx(-23.33334, abs=1e-6)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?,?,?,?,?,?)", rows)
    oracle = {
        r[0]: r[4]
        for r in con.execute(entry_mod.oracle_sql()["attribution_multi_touch"]).fetchall()
    }
    assert oracle["view"] == pytest.approx(got["view"], abs=1e-9)
    assert oracle["click"] == pytest.approx(got["click"], abs=1e-9)


def test_class_diversity_hand_example(spark):
    """Group 'bal': 2+2 of two classes -> lambda = (2+2)/(4*3) = 1/3,
    D = 2/3, effective = 3.  Group 'mono': one class -> D = 0,
    effective = 1.  Group 'solo': N = 1 -> NULLs."""
    from mapreduce_faultolerrant_localityaware_spark.operators.corpus import class_diversity

    rows = (
        [("bal", "en")] * 2 + [("bal", "fr")] * 2
        + [("mono", "en")] * 3 + [("solo", "de")]
    )
    df = spark.createDataFrame(rows, "g string, c string")
    out = {r["g"]: r for r in class_diversity(df, "g", "c").collect()}
    assert out["bal"]["simpson_d"] == pytest.approx(2 / 3, abs=1e-6)
    assert out["bal"]["effective_classes"] == pytest.approx(3.0, abs=1e-6)
    assert out["mono"]["simpson_d"] == pytest.approx(0.0, abs=1e-6)
    assert out["mono"]["effective_classes"] == pytest.approx(1.0, abs=1e-6)
    assert out["solo"]["simpson_d"] is None
    assert out["solo"]["effective_classes"] is None


def test_token_dispersion_bursty_vs_flat(spark):
    """'flat' appears once in each of 4 docs (VMR = (4*4-16)/(4*4) = 0
    over N=4 docs — sub-Poisson, perfectly even); 'burst' appears 4
    times in one doc (VMR = (4*16-16)/(4*4) = 3)."""
    from mapreduce_faultolerrant_localityaware_spark.operators.corpus import token_dispersion

    rows = [
        (1, "flat burst burst burst burst"),
        (2, "flat"),
        (3, "flat"),
        (4, "flat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["token"]: r for r in token_dispersion(df, top_k=10).collect()}
    assert out["flat"]["vmr"] == pytest.approx(0.0, abs=1e-6)
    assert (out["flat"]["total_count"], out["flat"]["doc_freq"]) == (4, 4)
    assert out["burst"]["vmr"] == pytest.approx(3.0, abs=1e-6)
    assert (out["burst"]["total_count"], out["burst"]["doc_freq"]) == (4, 1)


def test_centroid_cosine_matrix_orthogonal_and_aligned(spark):
    """Labels 0/1 sit on orthogonal axes (cosine 0); label 2 is label
    0 scaled (cosine 1); count cancellation: label 2 has 3 rows."""
    from mapreduce_faultolerrant_localityaware_spark.operators.similarity import (
        centroid_cosine_matrix,
    )

    rows = [
        (1, [1.0, 0.0], 0), (2, [3.0, 0.0], 0),
        (3, [0.0, 2.0], 1),
        (4, [5.0, 0.0], 2), (5, [7.0, 0.0], 2), (6, [2.0, 0.0], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {
        (r["label_a"], r["label_b"]): r
        for r in centroid_cosine_matrix(df, dim=2).collect()
    }
    assert out[(0, 1)]["cosine"] == pytest.approx(0.0, abs=1e-6)
    assert out[(0, 2)]["cosine"] == pytest.approx(1.0, abs=1e-6)
    assert out[(1, 2)]["cosine"] == pytest.approx(0.0, abs=1e-6)
    assert (out[(0, 2)]["n_a"], out[(0, 2)]["n_b"]) == (2, 3)


def test_k_anonymity_hand_example(spark):
    """Classes: (A: 3 rows, 2 segs), (B: 1 row, 1 seg) -> k = 1,
    l = 1, 4 rows total, 1 row below k=5 threshold... all 4 rows are
    below 5, so exposure = 1.0; with threshold 2 only B's single row
    is exposed."""
    rows = [
        ("A", "s1"), ("A", "s1"), ("A", "s2"),
        ("B", "s1"),
    ]
    df = spark.createDataFrame(rows, "q string, s string")
    r5 = rel.k_anonymity(df, ["q"], "s", k_threshold=5).collect()[0]
    assert (r5["n_rows"], r5["n_classes"]) == (4, 2)
    assert (r5["k_anonymity"], r5["l_diversity"]) == (1, 1)
    assert r5["n_rows_below_k"] == 4
    assert r5["pct_below_k"] == pytest.approx(1.0, abs=1e-6)
    r2 = rel.k_anonymity(df, ["q"], "s", k_threshold=2).collect()[0]
    assert r2["n_rows_below_k"] == 1
    assert r2["pct_below_k"] == pytest.approx(0.25, abs=1e-6)


def test_phash_dedup_report_buckets(spark):
    """Three media share a fingerprint (min-id canonical, 2 dropped);
    one is unique."""
    from mapreduce_faultolerrant_localityaware_spark.operators.multimodal import (
        phash_dedup_report,
    )

    fp = spark.createDataFrame(
        [(7, 42), (3, 42), (9, 42), (5, 13)], "media_id long, phash long"
    )
    out = {r["phash"]: r for r in phash_dedup_report(fp).collect()}
    assert (out[42]["n_copies"], out[42]["canonical_id"], out[42]["n_dropped"]) == (3, 3, 2)
    assert (out[13]["n_copies"], out[13]["n_dropped"]) == (1, 0)


def test_simjoin_containment_quote_detection(spark):
    """Doc 2's shingle set is a strict subset of doc 1's -> containment
    of 2 in 1 is 1.0 while Jaccard is far below the threshold."""
    from mapreduce_faultolerrant_localityaware_spark.operators.dedup import (
        simjoin_containment,
    )

    big = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    small = "beta gamma delta epsilon"  # 2 shingles, both inside big
    df = spark.createDataFrame(
        [(1, big), (2, small)], "doc_id long, text string"
    )
    out = simjoin_containment(df, threshold=0.9).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["c_b_in_a"] == pytest.approx(1.0, abs=1e-6)  # small in big
    assert r["c_a_in_b"] < 0.5


def test_session_paths_hand_example(spark):
    """User 1: one session view>click>purchase (+a 4th event ignored);
    user 2: two sessions (gap > 30 min), paths 'view' and
    'click>view'."""
    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 10, 0), "view"),
        (2, 1, dt.datetime(2024, 1, 1, 10, 1), "click"),
        (3, 1, dt.datetime(2024, 1, 1, 10, 2), "purchase"),
        (4, 1, dt.datetime(2024, 1, 1, 10, 3), "view"),
        (5, 2, dt.datetime(2024, 1, 1, 9, 0), "view"),
        (6, 2, dt.datetime(2024, 1, 1, 11, 0), "click"),
        (7, 2, dt.datetime(2024, 1, 1, 11, 10), "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {r["path"]: r for r in ev_ops.session_paths(df).collect()}
    assert set(out) == {"view>click>purchase", "view", "click>view"}
    assert out["view>click>purchase"]["n_sessions"] == 1
    assert out["view"]["share"] == pytest.approx(1 / 3, abs=1e-6)


def test_readability_simple_sentences(spark):
    """'The cat sat. The dog ran.' -> 6 words, 2 sentences, 6
    syllables (every word one vowel group) -> Flesch = 206.835 -
    1.015*3 - 84.6*1 = 119.19."""
    from mapreduce_faultolerrant_localityaware_spark.operators.textstats import (
        readability_scores,
    )

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran."), (2, "   "), (3, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in readability_scores(df).collect()}
    r = out[1]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 2, 6)
    assert r["flesch"] == pytest.approx(206.835 - 1.015 * 3 - 84.6 * 1, abs=1e-6)
    assert r["fk_grade"] == pytest.approx(0.39 * 3 + 11.8 * 1 - 15.59, abs=1e-6)
    assert out[2]["flesch"] is None  # whitespace-only: no words
    assert out[3]["flesch"] is None  # NULL text


def test_lang_mixture_detects_code_switching(spark):
    """Doc 1 is pure English; doc 2 mixes English and German markers
    evenly -> mixed flag set, deterministic top-2 election."""
    from mapreduce_faultolerrant_localityaware_spark.operators.textstats import (
        lang_mixture,
    )

    df = spark.createDataFrame(
        [
            (1, "the and of to in the and of"),
            (2, "the and of to der die und das"),
            (3, "zzz qqq xxx"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lang_mixture(df).collect()}
    assert out[1]["lang_top"] == "en"
    assert not out[1]["mixed"]
    assert out[2]["lang_top"] == "en" and out[2]["lang_second"] == "de"
    assert out[2]["mixed"]
    assert out[3]["lang_top"] == "und"
    assert out[3]["lang_second"] is None
    assert not out[3]["mixed"]


def test_clustering_coefficient_triangle_vs_star(spark):
    """A 3-clique: T = 1, wedges = 3 -> cc = 1.  A 3-star: T = 0,
    wedges = 3 -> cc = 0."""
    from mapreduce_faultolerrant_localityaware_spark.operators.graph import (
        clustering_coefficient,
    )

    clique = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "doc_a long, doc_b long"
    )
    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "doc_a long, doc_b long"
    )
    rc = clustering_coefficient(clique).collect()[0]
    assert (rc["n_triangles"], rc["wedges"]) == (1, 3)
    assert rc["global_cc"] == pytest.approx(1.0, abs=1e-6)
    rs = clustering_coefficient(star).collect()[0]
    assert (rs["n_triangles"], rs["wedges"]) == (0, 3)
    assert rs["global_cc"] == pytest.approx(0.0, abs=1e-6)


def test_price_volume_decomposition_effects_sum_to_delta(spark):
    """Two months: p goes 2.00->3.00, q goes 10->8.  ΔRev = 2400-2000
    = 400c; price = (3-2)*10 = +10.00; volume = 2*(8-10) = -4.00;
    joint = (3-2)*(8-10) = -2.00; 10-4-2 = 4.00 = ΔRev exactly."""
    rows = [
        (dt.datetime(2024, 1, 5), 20.0, 10.0),
        (dt.datetime(2024, 2, 5), 24.0, 8.0),
    ]
    df = spark.createDataFrame(
        rows, "l_shipdate timestamp, l_extendedprice double, l_quantity double"
    )
    out = sorted(
        ev_ops.price_volume_decomposition(df).collect(), key=lambda r: r["m"]
    )
    first, second = out
    assert first["price_effect"] is None  # no prior month
    assert second["rev_delta_cents"] == 400
    assert second["price_effect"] == pytest.approx(10.0, abs=1e-6)
    assert second["volume_effect"] == pytest.approx(-4.0, abs=1e-6)
    assert second["joint_effect"] == pytest.approx(-2.0, abs=1e-6)
    total = (
        second["price_effect"] + second["volume_effect"] + second["joint_effect"]
    )
    assert total == pytest.approx(second["rev_delta_cents"] / 100.0, abs=1e-6)


def test_new_vs_returning_split(spark):
    """u1 active d1+d2 (new on d1, returning d2); u2 active d2 only
    (new); duplicate same-day events collapse."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 9)), (1, dt.datetime(2024, 1, 1, 10)),
        (1, dt.datetime(2024, 1, 2, 9)),
        (2, dt.datetime(2024, 1, 2, 11)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {str(r["d"]): r for r in ev_ops.new_vs_returning(df).collect()}
    d1, d2 = out["2024-01-01"], out["2024-01-02"]
    assert (d1["n_new"], d1["n_returning"]) == (1, 0)
    assert (d2["n_new"], d2["n_returning"]) == (1, 1)
    assert d2["new_share"] == pytest.approx(0.5, abs=1e-6)


def test_roc_auc_perfect_and_random(spark):
    """Scores perfectly separate labels -> AUC 1; inverted -> 0;
    all-one-class -> NULL."""
    import pyspark.sql.functions as SF

    perfect = spark.createDataFrame(
        [(10, 1), (9, 1), (2, 0), (1, 0)], "v long, y long"
    )
    inverted = spark.createDataFrame(
        [(1, 1), (2, 1), (9, 0), (10, 0)], "v long, y long"
    )
    onecls = spark.createDataFrame([(1, 1), (2, 1)], "v long, y long")
    auc = lambda df: ev_ops.roc_auc(df, SF.col("v"), SF.col("y")).collect()[0]["auc"]
    assert auc(perfect) == pytest.approx(1.0, abs=1e-6)
    assert auc(inverted) == pytest.approx(0.0, abs=1e-6)
    assert auc(onecls) is None


def test_roc_auc_ties_half_credit(spark):
    """All scores tied: AUC = 0.5 exactly (average-rank treatment)."""
    import pyspark.sql.functions as SF

    df = spark.createDataFrame([(5, 1), (5, 1), (5, 0), (5, 0)], "v long, y long")
    r = ev_ops.roc_auc(df, SF.col("v"), SF.col("y")).collect()[0]
    assert r["auc"] == pytest.approx(0.5, abs=1e-6)


def test_lift_table_top_bucket_concentration(spark):
    """20 rows, top-10 scores all positive, bottom-10 all negative,
    2 bins: bucket 1 rate = 1, lift = 2, captures all positives."""
    import pyspark.sql.functions as SF

    rows = [(i, 100 - i, 1 if i <= 10 else 0) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "id long, v long, y long")
    out = {
        r["bucket"]: r
        for r in ev_ops.lift_table(
            df, SF.col("v"), SF.col("y"), SF.col("id"), n_bins=2
        ).collect()
    }
    b1, b2 = out[1], out[2]
    assert (b1["n"], b1["n_pos"]) == (10, 10)
    assert b1["lift"] == pytest.approx(2.0, abs=1e-6)
    assert b1["cum_capture"] == pytest.approx(1.0, abs=1e-6)
    assert b2["response_rate"] == pytest.approx(0.0, abs=1e-6)
    assert b2["cum_capture"] == pytest.approx(1.0, abs=1e-6)


def test_growth_accounting_bridge_identities(spark):
    """u1 active m1,m2,m4; u2 active m2 only.  m2: u1 retained, u2
    new; m2's silent-next users (u1 skips m3, u2 gone) churn into the
    DENSIFIED gap month m3 (r10: the month domain includes zero-active
    months, so churn lands in the month the users actually went
    silent, not the next active month); u1 is resurrected in m4.
    mau = new + retained + resurrected holds on every row and the
    bridge mau − prev_mau = new + resurrected − churned holds across
    the gap."""
    m = lambda month, day: dt.datetime(2024, month, day)
    rows = [
        (1, m(1, 5)), (1, m(2, 5)), (1, m(4, 5)),
        (2, m(2, 9)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["m"]: r for r in ev_ops.growth_accounting(df).collect()}
    base = 2024 * 12
    assert set(out) == {base + 1, base + 2, base + 3, base + 4}
    m1, m2, m3, m4 = (out[base + i] for i in (1, 2, 3, 4))
    assert (m1["mau"], m1["n_new"], m1["n_churned"]) == (1, 1, 0)
    assert (m2["n_new"], m2["n_retained"], m2["n_resurrected"]) == (1, 1, 0)
    assert (m3["mau"], m3["n_churned"]) == (0, 2)
    assert (m4["n_resurrected"], m4["n_churned"]) == (1, 0)
    prev = {base + 1: 0, base + 2: 1, base + 3: 2, base + 4: 0}
    for k, r in out.items():
        assert r["mau"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]
        assert r["mau"] - prev[k] == (
            r["n_new"] + r["n_resurrected"] - r["n_churned"]
        )


def test_diff_in_diff_nets_out_fixed_gap(spark):
    """Arm B (odd users) runs 10 above arm A in BOTH periods plus a
    +5 treatment effect post: DiD isolates exactly 5."""
    rows = [
        # arm A (even): pre 10, post 20
        (0, _d(1), 10.0), (0, _d(4), 20.0),
        # arm B (odd): pre 20 (fixed +10 gap), post 35 (= 30 + 5 effect)
        (1, _d(1), 20.0), (1, _d(4), 35.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    r = ev_ops.diff_in_diff(df).collect()[0]
    assert r["pre_a"] == pytest.approx(10.0, abs=1e-6)
    assert r["pre_b"] == pytest.approx(20.0, abs=1e-6)
    assert r["did"] == pytest.approx(5.0, abs=1e-6)


def test_cramers_v_perfect_association(spark):
    """a == b exactly (2x2, balanced): V = 1.  Independent uniform
    2x2: V = 0."""
    dep = spark.createDataFrame(
        [("x", "x")] * 5 + [("y", "y")] * 5, "a string, b string"
    )
    ind = spark.createDataFrame(
        [("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")] * 3,
        "a string, b string",
    )
    rv = lambda df: ev_ops.cramers_v(df, "a", "b").collect()[0]["cramers_v"]
    assert rv(dep) == pytest.approx(1.0, abs=1e-6)
    assert rv(ind) == pytest.approx(0.0, abs=1e-6)


def test_durbin_watson_trending_vs_alternating(spark):
    """A strong trend -> DW near 0; perfect alternation -> DW near 4;
    hand value for the 4-point alternating series [1,3,1,3]:
    residual ne = [-4,4,-4,4] (n-scaled), num = 3*64 = 192,
    den = 4*16 = 64 -> DW = 3.0."""
    trend = spark.createDataFrame(
        [(_d(i + 1), i * 10) for i in range(10)], "d timestamp, v long"
    )
    alt = spark.createDataFrame(
        [(_d(1), 1), (_d(2), 3), (_d(3), 1), (_d(4), 3)], "d timestamp, v long"
    )
    dw = lambda df: ev_ops.durbin_watson(df, "d", "v").collect()[0]["dw"]
    assert dw(trend) < 0.5
    assert dw(alt) == pytest.approx(3.0, abs=1e-6)


def test_durbin_watson_constant_is_null(spark):
    df = spark.createDataFrame(
        [(_d(1), 5), (_d(2), 5)], "d timestamp, v long"
    )
    assert ev_ops.durbin_watson(df, "d", "v").collect()[0]["dw"] is None
