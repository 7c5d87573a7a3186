"""Dynamic partition pruning evidence — the join-driven cousin of the
static partition pruning already proven by partitioned_roundtrip.

At 100 TB the classic star-join shape is "fact partitioned on the join
key, filter lives on the dim side": no static filter ever touches the
fact table, so without DPP the scan reads EVERY partition.  Catalyst's
DPP injects the dim-side filter result as a runtime subquery into the
fact scan's PartitionFilters — this test pins that the engine's scans
actually get that treatment (config intact, partitioned layout
compatible), and that the pruned result is value-identical to the
unpruned one.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mapreduce_faultolerrant_localityaware_spark._scratch import scratch_dir
from mapreduce_faultolerrant_localityaware_spark.sources.scans import scan


def _fact_dim(spark, sf_dir):
    root = scratch_dir("dpp")
    orders = scan(spark, sf_dir, "orders").withColumn(
        "omonth", F.date_format("o_orderdate", "yyyy-MM")
    )
    path = os.path.join(root, "fact")
    orders.write.partitionBy("omonth").mode("overwrite").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("1996-01", "keep"), ("1996-02", "keep"), ("1997-05", "drop")],
        "omonth STRING, tag STRING",
    )
    return fact, dim


def test_dim_filter_prunes_fact_partitions_at_runtime(spark, sf_dir):
    fact, dim = _fact_dim(spark, sf_dir)
    j = (
        fact.join(dim, "omonth")
        .filter(F.col("tag") == "keep")
        .groupBy("omonth")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), (
        "no DPP subquery in the fact scan's PartitionFilters:\n" + plan[:2000]
    )
    got = {r["omonth"]: r["n"] for r in j.collect()}
    expect = {
        r["omonth"]: r["n"]
        for r in fact.filter(F.col("omonth").isin("1996-01", "1996-02"))
        .groupBy("omonth")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect and set(got) == {"1996-01", "1996-02"}


def test_pruning_is_the_optimizer_not_luck(spark, sf_dir):
    """Negative control: with DPP disabled the same plan has no
    runtime pruning subquery — the feature, not coincidence, produces
    the PartitionFilters entry."""
    fact, dim = _fact_dim(spark, sf_dir)
    key = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        j = fact.join(dim, "omonth").filter(F.col("tag") == "keep").groupBy(
            "omonth"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" not in plan.lower()
    finally:
        spark.conf.set(key, old)
