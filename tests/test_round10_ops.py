"""Hand-computed pins for the round-10 fixes — each verifies, on a
tiny worked example, the EDGE the round-9 advice found untestable on
TPC-H data:

- growth_accounting: a calendar month with ZERO actives must appear
  (mau = 0) and receive the churners from the month before the gap,
  keeping the bridge identity Δmau = new + resurrected − churned
  across the gap (TPC-H orders span every month, so the driver gate
  never exercises this);
- simjoin_containment: a doc genuinely contained in another must
  reach containment 1.0 even when its most common shingles exceed
  the df cap — numerator and denominator now share the capped
  universe (join-side-only capping put a <1 ceiling on containment).
"""

from __future__ import annotations

import datetime as dt

import pytest

from mapreduce_faultolerrant_localityaware_spark.operators import dedup
from mapreduce_faultolerrant_localityaware_spark.operators import events as ev_ops


def test_growth_accounting_gap_month_gets_the_churn(spark):
    """u1 active Jan/Feb/Apr, u2 active Jan only; March is silent.
    March must appear with mau = 0 and n_churned = 1 (u1 went silent
    after Feb), and April's resurrection must NOT inherit that churn."""
    rows = [
        (1, dt.datetime(2024, 1, 10)),
        (1, dt.datetime(2024, 2, 5)),
        (1, dt.datetime(2024, 4, 20)),
        (2, dt.datetime(2024, 1, 15)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["m"]: r for r in ev_ops.growth_accounting(df).collect()}
    jan, feb, mar, apr = (2024 * 12 + m for m in (1, 2, 3, 4))
    assert set(out) == {jan, feb, mar, apr}  # gap month present
    assert (out[jan]["mau"], out[jan]["n_new"], out[jan]["n_churned"]) == (2, 2, 0)
    # u2 silent after Jan -> churned into Feb
    assert (out[feb]["mau"], out[feb]["n_retained"], out[feb]["n_churned"]) == (1, 1, 1)
    # u1 silent after Feb -> churned into the EMPTY March, not April
    assert (out[mar]["mau"], out[mar]["n_churned"]) == (0, 1)
    assert (out[apr]["mau"], out[apr]["n_resurrected"], out[apr]["n_churned"]) == (
        1,
        1,
        0,
    )
    # bridge identity holds across the gap
    prev = {jan: 0, feb: 2, mar: 1, apr: 0}
    for m in (feb, mar, apr):
        r = out[m]
        assert r["mau"] - prev[m] == (
            r["n_new"] + r["n_resurrected"] - r["n_churned"]
        ), f"bridge broken at month {m}"


def test_containment_reaches_one_despite_df_cap(spark):
    """Doc 1 ('x y z') is fully contained in doc 2 ('x y z w') over
    2-gram shingles.  Four noise docs share the 'x y' shingle, pushing
    its df over the cap (2) — with the shared capped universe the
    containment is STILL 1/1 = 1.0; the old join-side-only cap said
    1/2 = 0.5 and the pair missed a 0.9 threshold."""
    rows = [
        (1, "x y z"),
        (2, "x y z w"),
        (3, "x y q3"),
        (4, "x y q4"),
        (5, "x y q5"),
        (6, "x y q6"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.simjoin_containment(
        df, n=2, threshold=0.9, max_shingle_df=2
    ).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in out}
    assert (1, 2) in pairs, f"contained pair missing: {sorted(pairs)}"
    r = pairs[(1, 2)]
    # capped universe: doc1 keeps only 'y z' (df=2), doc2 keeps
    # 'y z' + 'z w'; intersection = {'y z'}
    assert r["common"] == 1
    assert r["c_a_in_b"] == pytest.approx(1.0, abs=1e-9)
    assert r["c_b_in_a"] == pytest.approx(0.5, abs=1e-9)
    # the noise docs' only shared shingle was capped away: no pairs
    assert all(a == 1 and b == 2 for a, b in pairs)
