"""Streaming == batch on the same bounded input (the replay-harness
property that puts streaming under the oracle gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_faultolerrant_localityaware_spark import streaming as S
from mapreduce_faultolerrant_localityaware_spark.operators.wordcount import wordcount_from_text
from mapreduce_faultolerrant_localityaware_spark.sources.scans import scan


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
