"""Plan-shape guardrails for the full 22-query TPC-H suite.

Correctness is covered by the DuckDB oracle gate (every tpch_q* has an
oracle_sql entry); these tests pin the PHYSICAL properties that make
the suite viable at 100 TB — partial aggregation before the exchange,
dim-table broadcasts, top-k never planning a total sort, and date
filters reaching the parquet scan.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from mapreduce_faultolerrant_localityaware_spark.plans import assert_pushed_filters


def _plan(spark, sf_dir, name: str) -> str:
    df = E.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


ALL_TPCH = [f"tpch_q{i}" for i in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12,
                                   13, 14, 15, 16, 17, 18, 19, 20, 21, 22)]


def test_full_suite_registered():
    qs, os_ = E.queries(), E.oracle_sql()
    for name in ALL_TPCH:
        assert name in qs, f"{name} missing from queries()"
        assert name in os_, f"{name} missing from oracle_sql()"


def test_q1_partial_agg_before_exchange(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q1")
    # map-side combine: a partial HashAggregate must appear below the
    # exchange so the shuffle carries ~6 groups, not 600M rows
    assert "partial" in plan.lower()
    assert plan.lower().index("exchange") < plan.lower().rindex("partial")


def test_q1_date_filter_pushed(spark, sf_dir):
    from mapreduce_faultolerrant_localityaware_spark.sources.scans import scan
    from pyspark.sql import functions as F

    li = scan(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2001-06-01")
    assert_pushed_filters(li.select("l_returnflag"), "l_shipdate")


@pytest.mark.parametrize("name", ["tpch_q2", "tpch_q8", "tpch_q9", "tpch_q16", "tpch_q20"])
def test_dims_are_broadcast(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join for dim tables"


@pytest.mark.parametrize("name", ["tpch_q2", "tpch_q21"])
def test_topk_never_total_sorts(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "TakeOrderedAndProject" in plan, f"{name}: top-k planned a total sort"


def test_q13_is_left_outer(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q13")
    assert "LeftOuter" in plan


def test_q16_not_in_is_anti_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q16")
    assert "LeftAnti" in plan


def test_q22_anti_join_and_scalar_broadcast(spark, sf_dir):
    """NOT-EXISTS keeps the anti-join shape; the avg-balance scalar is
    a ONE-ROW broadcast cross join (round 6 — it replaced the session-
    global temp view a SQL scalar subquery needed), so exactly one
    BroadcastNestedLoopJoin with a 1-row build side is expected and
    no CartesianProduct ever."""
    plan = _plan(spark, sf_dir, "tpch_q22")
    assert "LeftAnti" in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in plan


def test_q21_semantics_sole_late_supplier(spark):
    """Hand-built micro-case: order 1 has two suppliers, only supplier
    10 ships late -> counted; order 2 has one supplier (excluded by the
    EXISTS arm); order 3 has two late suppliers (excluded by NOT
    EXISTS)."""
    import datetime as dt

    from pyspark.sql import functions as F

    d = dt.datetime

    orders = spark.createDataFrame(
        [(1, d(1996, 1, 1)), (2, d(1996, 1, 1)), (3, d(1996, 1, 1))],
        ["o_orderkey", "o_orderdate"],
    ).withColumn("o_orderstatus", F.lit("F"))
    li = spark.createDataFrame(
        [
            (1, 10, d(1996, 6, 1)),   # late, sole late supplier in multi-supp order
            (1, 11, d(1996, 1, 15)),  # on time
            (2, 10, d(1996, 6, 1)),   # late but single-supplier order
            (3, 10, d(1996, 6, 1)),   # late
            (3, 12, d(1996, 7, 1)),   # also late -> order 3 excluded
        ],
        ["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    supp = spark.createDataFrame(
        [(10, "S10"), (11, "S11"), (12, "S12")], ["s_suppkey", "s_name"]
    )

    of = orders.filter(F.col("o_orderstatus") == "F")
    j = li.join(of, li.l_orderkey == of.o_orderkey)
    late = j.filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    n_late = late.groupBy(F.col("l_orderkey").alias("nl_key")).agg(
        F.countDistinct("l_suppkey").alias("n_late_supp")
    )
    n_all = j.groupBy(F.col("l_orderkey").alias("na_key")).agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    sole = (
        late.join(n_late.filter(F.col("n_late_supp") == 1), late.l_orderkey == F.col("nl_key"))
        .join(n_all.filter(F.col("n_supp") >= 2), late.l_orderkey == F.col("na_key"))
    )
    out = (
        sole.join(supp, sole.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .collect()
    )
    assert {(r["s_name"], r["numwait"]) for r in out} == {("S10", 1)}
