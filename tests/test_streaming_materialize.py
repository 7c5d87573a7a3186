"""Streaming == batch on the same bounded input (the replay-harness
property that puts streaming under the oracle gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_faultolerrant_localityaware_spark import streaming as S
from mapreduce_faultolerrant_localityaware_spark.operators.wordcount import wordcount_from_text
from mapreduce_faultolerrant_localityaware_spark.sources.scans import scan

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.streaming]


def test_streaming_wordcount_equals_batch(spark, sf_dir):
    stream = S.stream_table(spark, sf_dir, "documents")
    got = {
        (r["word"], r["count"])
        for r in S.run_to_batch(S.streaming_wordcount(stream, text_col="text"), spark).collect()
    }
    want = {
        (r["word"], r["count"])
        for r in wordcount_from_text(
            scan(spark, sf_dir, "documents").select(F.col("text").alias("value")), sort=False
        ).collect()
    }
    assert got == want


def test_empty_bounded_stream_yields_empty_result(spark, tmp_path):
    """Zero micro-batches must still produce a readable, empty result
    (regression: the scratch parquet used to never be written)."""
    src = str(tmp_path / "src")
    spark.createDataFrame([], "word string, count long").write.parquet(src)
    stream = spark.readStream.schema("word string, count long").parquet(src)
    agg = stream.groupBy("word").agg(F.sum("count").alias("count"))
    out = S.run_to_batch(agg, spark)
    assert out.count() == 0
    assert set(out.columns) == {"word", "count"}


def test_append_mode_empty_and_idempotent_layout(spark, tmp_path):
    """Append-mode materialization survives an empty input and writes
    per-batch-id directories (retry-idempotent, never double-appends)."""
    src = str(tmp_path / "srcA")
    spark.range(0).selectExpr("id AS k").write.parquet(src)
    stream = spark.readStream.schema("k long").parquet(src)
    out = S.run_to_batch(stream, spark, output_mode="append")
    assert out.count() == 0

    src2 = str(tmp_path / "srcB")
    spark.range(10).selectExpr("id AS k").write.parquet(src2)
    stream2 = spark.readStream.schema("k long").parquet(src2)
    out2 = S.run_to_batch(stream2, spark, output_mode="append")
    assert sorted(r["k"] for r in out2.collect()) == list(range(10))


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    stream = S.stream_table(spark, sf_dir, "events")
    got = S.run_to_batch(S.windowed_event_counts(stream), spark)
    ev = scan(spark, sf_dir, "events")
    want = (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    canon = lambda df: {  # noqa: E731
        (r["window_start"], r["event_type"], r["n_events"], round(r["sum_value"], 6))
        for r in df.collect()
    }
    assert canon(got) == canon(want)
