"""Property-based pins for the round-9b operator batteries — the
algebraic identities each estimator must hold on ARBITRARY inputs,
beyond the hand-computed examples in tests/test_round9b_ops.py:

- Gini is scale-invariant and bounded [0, (n-1)/n];
- ROC-AUC complements under label flip (AUC(y) + AUC(1−y) = 1, ties
  included) and is bounded [0, 1];
- the growth-accounting bridge identities (mau = new + retained +
  resurrected; Δmau = new + resurrected − churned on consecutive
  active months) hold for every random activity pattern.

Few examples, batched rows per example — each hypothesis example costs
a Spark job, so the budget goes to input diversity, not example count
(the test_property.py discipline).
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as SF
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_faultolerrant_localityaware_spark.operators import events as ev_ops
from mapreduce_faultolerrant_localityaware_spark.operators import relational as rel

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    cents=st.lists(st.integers(min_value=0, max_value=10_000), min_size=2, max_size=30),
    scale=st.integers(min_value=2, max_value=50),
)
@settings(**_SETTINGS)
def test_gini_scale_invariant_and_bounded(spark, cents, scale):
    rows = [("g", i, c) for i, c in enumerate(cents)]
    scaled = [("g", i, c * scale) for i, c in enumerate(cents)]
    df = spark.createDataFrame(rows, "g string, id long, cents long")
    df2 = spark.createDataFrame(scaled, "g string, id long, cents long")
    g1 = rel.gini_index(df, "g", "id", "cents").collect()[0]["gini"]
    g2 = rel.gini_index(df2, "g", "id", "cents").collect()[0]["gini"]
    if g1 is None:
        assert sum(cents) == 0 and g2 is None
    else:
        n = len(cents)
        assert g1 == pytest.approx(g2, abs=2e-6)  # integer scaling is exact
        assert -1e-9 <= g1 <= (n - 1) / n + 1e-9


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # score (ties likely)
            st.booleans(),
        ),
        min_size=4,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_roc_auc_label_flip_complement(spark, data):
    rows = [(v, int(y)) for v, y in data]
    df = spark.createDataFrame(rows, "v long, y long")
    a = ev_ops.roc_auc(df, SF.col("v"), SF.col("y")).collect()[0]["auc"]
    b = ev_ops.roc_auc(df, SF.col("v"), 1 - SF.col("y")).collect()[0]["auc"]
    if a is None:
        assert b is None  # single-class labels
    else:
        assert 0.0 - 1e-9 <= a <= 1.0 + 1e-9
        assert a + b == pytest.approx(1.0, abs=2e-6)


@given(
    activity=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),  # user
            st.integers(min_value=1, max_value=9),  # month (within one year)
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_growth_accounting_bridge_identities_random(spark, activity):
    rows = [(u, dt.datetime(2024, m, 5)) for u, m in activity]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sorted(ev_ops.growth_accounting(df).collect(), key=lambda r: r["m"])
    for r in out:
        assert r["mau"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]
    by_m = {r["m"]: r for r in out}
    for r in out:
        prev = by_m.get(r["m"] - 1)
        if prev is not None:
            # consecutive active months: churn attribution is exact
            assert (
                r["mau"] - prev["mau"]
                == r["n_new"] + r["n_resurrected"] - r["n_churned"]
            )
