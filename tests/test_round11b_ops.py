"""Round-11b operator tests: the experimentation/eval additions —
log-rank survival test, information gain, group-sequential monitor,
off-policy evaluation, Simpson's-paradox audit, hashing-trick
featurizer, and graph modularity.

Each test pins the operator against a hand-computed (or brute-force
Python) result on a constructed fixture — the oracle gate covers the
real tables; these cover the algebra on shapes the synthetic data
can't guarantee (a true Simpson reversal, a known-modularity graph,
a log-rank fixture with hand-checked risk sets).
"""

from __future__ import annotations

import datetime
import math
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_faultolerrant_localityaware_spark.operators import events as events_ops
from mapreduce_faultolerrant_localityaware_spark.operators import textstats
from mapreduce_faultolerrant_localityaware_spark.operators.graph import modularity


TS = datetime.datetime


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


# ---------------------------------------------------------------------------
# logrank_test
# ---------------------------------------------------------------------------

def test_logrank_hand_computed(spark):
    """4 users per cohort; deaths on day 1 (A), day 2 (B), day 3 (A+B).
    Hand-computed risk sets:
      day1: n1=4 n2=4 d=1 (A)  -> E1 = 1*4/8 = .5   V = 4*4*7/(64*7)=.25
      day2: n1=3 n2=4 d=1 (B)  -> E1 = 3/7          V = 12*6/(49*6)=12/49
      day3: n1=3 n2=3 d=2      -> E1 = 1            V = 2*9*4/(36*5)=.4
    O1 = 2, E1 = .5 + 3/7 + 1, V = .25 + 12/49 + .4
    """
    rows = []
    eid = 0
    # every user has a signup on day 0 so they exist in the cohort
    for u in range(8):
        rows.append((eid, TS(2024, 1, 1), u, "signup", 0.0)); eid += 1
    # cohort = pmod(u,2): even -> A(g=0), odd -> B(g=1)
    rows.append((eid, TS(2024, 1, 2), 0, "purchase", 1.0)); eid += 1   # day1 A
    rows.append((eid, TS(2024, 1, 3), 1, "purchase", 1.0)); eid += 1   # day2 B
    rows.append((eid, TS(2024, 1, 4), 2, "purchase", 1.0)); eid += 1   # day3 A
    rows.append((eid, TS(2024, 1, 4), 3, "purchase", 1.0)); eid += 1   # day3 B
    out = events_ops.logrank_test(_events(spark, rows)).collect()[0]
    assert (out["n_a"], out["n_b"]) == (4, 4)
    assert (out["deaths_a"], out["deaths_b"]) == (2, 2)
    e1 = 0.5 + 3.0 / 7.0 + 1.0
    v = 0.25 + 12.0 / 49.0 + 0.4
    assert abs(out["o_minus_e"] - (2.0 - e1)) < 1e-5
    assert abs(out["var_lr"] - v) < 1e-5
    assert abs(out["chi2"] - (2.0 - e1) ** 2 / v) < 1e-4


def test_logrank_symmetric_cohorts_zero(spark):
    """Mirrored cohorts (same death days in both groups) → O−E = 0."""
    rows = []
    eid = 0
    for u in range(6):
        rows.append((eid, TS(2024, 1, 1), u, "signup", 0.0)); eid += 1
    for day, pair in ((2, (0, 1)), (3, (2, 3))):
        for u in pair:
            rows.append((eid, TS(2024, 1, day), u, "purchase", 1.0)); eid += 1
    out = events_ops.logrank_test(_events(spark, rows)).collect()[0]
    assert out["o_minus_e"] == 0.0
    assert out["chi2"] == 0.0


# ---------------------------------------------------------------------------
# info_gain
# ---------------------------------------------------------------------------

def test_info_gain_bounds_on_real_table(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = events_ops.info_gain(ev).collect()
    assert {r["feature"] for r in rows} == {"dow", "hour6", "value_band"}
    for r in rows:
        # IG ≥ 0 (up to the micro-carry rounding) and ≤ min(H_x, H_y)
        assert r["info_gain"] >= -1e-4
        assert r["info_gain"] <= min(r["h_x"], r["h_y"]) + 1e-4
        # H(X,Y) ≤ H(X) + H(Y), both ≤ H(X,Y) (monotonicity)
        assert r["h_xy"] <= r["h_x"] + r["h_y"] + 1e-4
        assert max(r["h_x"], r["h_y"]) <= r["h_xy"] + 1e-4


def test_info_gain_deterministic_feature(spark):
    """y fully determined by the hour bucket → IG(hour6) == H(Y)."""
    rows = []
    for i in range(40):
        h = (i % 4) * 6  # hours 0, 6, 12, 18 → four hour6 buckets
        rows.append((i, TS(2024, 1, 1, h, 0), 1, f"type{i % 4}", 1.0))
    out = {
        r["feature"]: r for r in events_ops.info_gain(_events(spark, rows)).collect()
    }
    r = out["hour6"]
    assert abs(r["info_gain"] - r["h_y"]) < 1e-4
    assert abs(r["ig_ratio"] - 1.0) < 1e-4
    assert abs(r["h_y"] - math.log(4)) < 1e-4


# ---------------------------------------------------------------------------
# ab_sequential
# ---------------------------------------------------------------------------

def test_ab_sequential_cumulative_identities(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = events_ops.ab_sequential(ev).orderBy("d").collect()
    assert rows, "expected at least one day"
    prev = None
    for r in rows:
        # cumulative counts are monotone and conversions never exceed trials
        if prev is not None:
            assert r["n_a"] >= prev["n_a"] and r["n_b"] >= prev["n_b"]
            assert r["x_a"] >= prev["x_a"] and r["x_b"] >= prev["x_b"]
        assert 0 <= r["x_a"] <= r["n_a"] and 0 <= r["x_b"] <= r["n_b"]
        # O'Brien-Fleming boundary decreases toward z_alpha at full information
        assert r["boundary"] >= 2.963 - 1e-6
        assert r["crossed"] == (abs(r["z"]) >= r["boundary"])
        prev = r
    assert abs(rows[-1]["boundary"] - 2.963) < 1e-6  # frac == 1 on the last day


# ---------------------------------------------------------------------------
# offpolicy_eval
# ---------------------------------------------------------------------------

def test_offpolicy_uniform_log_identities(spark):
    """Log that plays click/view equally per context → p̂ = 0.5, so every
    matched weight is exactly 1.0: IPS = matched reward mass / n,
    SNIPS = matched mean reward, ESS = n_matched."""
    rows = []
    eid = 0
    for u in range(8):
        for a, r in (("click", 2.0), ("view", 4.0)):
            rows.append((eid, TS(2024, 1, 1), u, a, r)); eid += 1
    out = events_ops.offpolicy_eval(_events(spark, rows)).collect()[0]
    assert out["n"] == 16 and out["n_matched"] == 16
    assert out["clip_frac"] == 0.0
    assert abs(out["sum_w"] - 16.0) < 1e-6
    assert abs(out["ips"] - 3.0) < 1e-6     # (2+4)/2 per pair, all matched
    assert abs(out["snips"] - 3.0) < 1e-6
    assert abs(out["ess"] - 16.0) < 1e-6


def test_offpolicy_unmatched_actions_drop_out(spark):
    """Actions outside the target policy get weight 0 — they count in n
    but contribute nothing to IPS/SNIPS mass."""
    rows = []
    eid = 0
    for u in range(4):
        rows.append((eid, TS(2024, 1, 1), u, "click", 10.0)); eid += 1
        rows.append((eid, TS(2024, 1, 1), u, "error", 99.0)); eid += 1
    out = events_ops.offpolicy_eval(_events(spark, rows)).collect()[0]
    assert out["n"] == 8 and out["n_matched"] == 4
    # p̂(click|x) = 0.5 → w = 1.0 for the click rows; errors weigh 0
    assert abs(out["snips"] - 10.0) < 1e-6
    assert abs(out["ess"] - 4.0) < 1e-6


# ---------------------------------------------------------------------------
# simpsons_check
# ---------------------------------------------------------------------------

def test_simpsons_reversal_detected(spark):
    """Classic reversal: B wins inside BOTH segments, but A's traffic is
    concentrated in the high-converting segment so A wins pooled —
    every segment must flag reversed=True."""
    rows = []
    eid = 0

    def add(day, user, conv, n):
        nonlocal eid
        for _ in range(n):
            rows.append((eid, TS(2024, 1, day), user, "purchase" if conv else "view", 1.0))
            eid += 1

    # day 1 (segment Monday): A = 80 trials 60 conv (75%), B = 20 trials 16 conv (80%)
    add(1, 0, True, 60); add(1, 0, False, 20)
    add(1, 1, True, 16); add(1, 1, False, 4)
    # day 2 (segment Tuesday): A = 20 trials 4 conv (20%), B = 80 trials 20 conv (25%)
    add(2, 0, True, 4); add(2, 0, False, 16)
    add(2, 1, True, 20); add(2, 1, False, 60)
    out = events_ops.simpsons_check(_events(spark, rows)).collect()
    assert len(out) == 2
    for r in out:
        assert r["seg_dir"] == 1          # B better inside each segment
        assert r["pooled_dir"] == -1      # A better pooled (64% vs 36%)
        assert r["reversed"] is True


def test_simpsons_no_reversal_on_consistent_data(spark):
    rows = []
    eid = 0
    for day in (1, 2):
        for _ in range(10):
            rows.append((eid, TS(2024, 1, day), 0, "view", 1.0)); eid += 1
        for _ in range(10):
            rows.append((eid, TS(2024, 1, day), 1, "purchase", 1.0)); eid += 1
    out = events_ops.simpsons_check(_events(spark, rows)).collect()
    assert all(not r["reversed"] for r in out)


# ---------------------------------------------------------------------------
# feature_hash
# ---------------------------------------------------------------------------

def test_feature_hash_conservation(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = textstats.feature_hash(docs).collect()
    n_docs_total = docs.count()
    # exact conservation: bucket masses sum to the corpus token count
    from mapreduce_faultolerrant_localityaware_spark.functions.text import tokens

    exact_total = docs.select(
        F.coalesce(F.sum(F.size(tokens("text"))), F.lit(0)).cast("long").alias("n")
    ).collect()[0]["n"]
    assert sum(r["n_tokens"] for r in out) == exact_total
    assert abs(sum(r["mass_share"] for r in out) - 1.0) < 1e-3
    for r in out:
        assert 0 <= r["bucket"] < 64
        assert r["n_distinct_tokens"] >= 1
        assert 1 <= r["n_docs"] <= n_docs_total


def test_feature_hash_bucket_is_value_pure(spark):
    """The same token always lands in the same bucket regardless of
    which doc carries it (the md5 fold is a pure value function)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma"), (3, "alpha gamma")],
        "doc_id long, text string",
    )
    out = textstats.feature_hash(docs).collect()
    # 3 distinct tokens spread over ≤3 buckets, 2 docs each
    assert sum(r["n_distinct_tokens"] for r in out) == 3
    assert sum(r["n_tokens"] for r in out) == 6


# ---------------------------------------------------------------------------
# graph modularity
# ---------------------------------------------------------------------------

def test_modularity_two_cliques(spark):
    """Two disjoint triangles with matching communities: m=6, each
    community has L_c=3, D_c=6 → Q_c = 3/6 − (6/12)² = 0.25 each,
    total modularity 0.5 — the textbook two-clique value."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)], "src long, dst long"
    )
    comms = spark.createDataFrame(
        [(n, n // 4) for n in range(1, 7)], "node long, comm long"
    )
    out = modularity(edges, comms).collect()
    assert len(out) == 2
    for r in out:
        assert r["n_nodes"] == 3 and r["l_intra"] == 3 and r["d_total"] == 6
        assert abs(r["q_c"] - 0.25) < 1e-9


def test_modularity_single_community_is_zero(spark):
    """Everything in one community: Q = m/m − (2m/2m)² = 0 exactly."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    comms = spark.createDataFrame([(n, 0) for n in range(1, 5)], "node long, comm long")
    out = modularity(edges, comms).collect()
    assert len(out) == 1
    assert out[0]["q_c"] == 0.0


def test_modularity_dedupes_and_canonicalizes(spark):
    """Duplicate and reversed edges collapse to one undirected edge;
    self-loops drop."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (1, 1)], "src long, dst long"
    )
    comms = spark.createDataFrame([(1, 0), (2, 1)], "node long, comm long")
    out = modularity(edges, comms).collect()
    assert sum(r["l_intra"] for r in out) == 0
    assert sum(r["d_total"] for r in out) == 2  # one edge, two ends
