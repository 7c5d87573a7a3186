"""Contract tests for the round-11b scan-once materialization
discipline (operators/_materialize.py) and the measurement that
motivated it.

The load-bearing fact: AQE does NOT reuse a shared aggregate stage
across sibling plan branches — a frame consumed by k branches compiles
into k copies of its subtree.  ``test_aqe_does_not_dedupe_branches``
pins that measurement; if a future Spark starts deduplicating, the
test fails and the materialize_once call sites can be revisited (they
would then be belt-and-braces, not load-bearing).
"""

from __future__ import annotations

import os
import re
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_faultolerrant_localityaware_spark.operators._materialize import (
    materialize_once,
)
from mapreduce_faultolerrant_localityaware_spark.plans.introspect import (
    scan_counts_from_plan,
)


def _shared_agg_probe(spark):
    """The minimal shape every scalar attach compiles to: one grouped
    aggregate feeding both the output rows and a 1-row total."""
    df = (
        spark.range(0, 100_000)
        .withColumn("k", F.pmod("id", 100))
        .groupBy("k")
        .agg(F.sum("id").alias("s"))
    )
    tot = df.agg(F.sum("s").alias("t"))
    return df, df.join(F.broadcast(tot))


def test_aqe_does_not_dedupe_branches(spark):
    """The probe's executed plan must contain TWO copies of the
    range->aggregate subtree (no ReusedExchange between the sibling
    branches) — the measured behavior the discipline exists for."""
    _, joined = _shared_agg_probe(spark)
    joined.write.format("noop").mode("overwrite").save()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    exchanges = re.findall(r"Exchange hashpartitioning\(k#\d+L", plan)
    assert len(exchanges) == 2, (
        "expected the shared aggregate to compile into two independent "
        "exchanges; if Spark now reuses the stage, the materialize_once "
        f"call sites are no longer load-bearing:\n{plan}"
    )
    assert "ReusedExchange" not in plan


def test_materialize_once_severs_lineage_and_preserves_values(spark):
    df, _ = _shared_agg_probe(spark)
    mat = materialize_once(df)
    # lineage severed: downstream consumers read the RDD, not the plan
    tot = mat.agg(F.sum("s").alias("t"))
    joined = mat.join(F.broadcast(tot))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan
    assert "Exchange hashpartitioning(k#" not in plan  # aggregate not re-run
    # values identical to the unmaterialized frame
    expect = {r["k"]: r["s"] for r in df.collect()}
    got = {r["k"]: r["s"] for r in mat.collect()}
    assert got == expect
    t = joined.select("t").head()["t"]
    assert t == sum(expect.values())


def test_materialize_once_computes_upstream_at_construction(spark):
    """Documented AQE behavior: resolving the checkpoint RDD finalizes
    the adaptive plan, which RUNS the upstream stages at construction.
    Builders that time query construction inside the stopwatch stay
    honest; if a future Spark defers this, the assertion flips and the
    docstring should be updated — either way the frame computes at
    most once."""
    sc = spark.sparkContext
    before = sc._jsc.sc().statusTracker().getJobIdsForGroup(None)
    df, _ = _shared_agg_probe(spark)
    _ = materialize_once(df)
    after = sc._jsc.sc().statusTracker().getJobIdsForGroup(None)
    assert len(after) > len(before), (
        "lazy checkpoint no longer materializes at construction under "
        "AQE — update _materialize.py's docstring and re-check the "
        "bench/slopes stopwatch placement"
    )


def test_scan_counts_from_plan_parses_formatted_plan(spark, sf_dir):
    from mapreduce_faultolerrant_localityaware_spark.plans.introspect import (
        formatted_plan,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    both = docs.crossJoin(F.broadcast(orders.agg(F.count("*").alias("n"))))
    twice = both.unionByName(both)
    counts = scan_counts_from_plan(formatted_plan(twice))
    assert counts.get("documents") == 2
    assert counts.get("orders") == 2
