"""Structured Streaming tests — memory-source micro-batches through
the streaming word-count and watermarked windowed aggregation.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from mapreduce_faultolerrant_localityaware_spark.streaming import (
    streaming_wordcount,
    windowed_event_counts,
)
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.streaming]


def _run_until(query, predicate, timeout=60.0):
    end = time.time() + timeout
    while time.time() < end:
        query.processAllAvailable()
        if predicate():
            return True
        time.sleep(0.2)
    return False


def test_streaming_wordcount_memory_sink(spark):
    spark.sql("DROP TABLE IF EXISTS wc_out")
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "50").load()
        .select(F.concat(F.lit("alpha beta alpha line "), F.col("value").cast("string")).alias("value"))
    )
    counts = streaming_wordcount(src)
    q = (
        counts.writeStream.format("memory")
        .queryName("wc_out")
        .outputMode("complete")
        .start()
    )
    try:
        ok = _run_until(
            q, lambda: spark.sql("SELECT * FROM wc_out WHERE word='alpha'").count() > 0
        )
        assert ok, "no streaming output produced"
        rows = {r["word"]: r["count"] for r in spark.sql("SELECT * FROM wc_out").collect()}
        assert rows["alpha"] == 2 * rows["beta"]  # alpha appears twice per line
    finally:
        q.stop()


def test_windowed_event_counts_watermark(spark):
    src = spark.readStream.format("rate").option("rowsPerSecond", "100").load()
    events = src.select(
        F.col("timestamp").alias("ts"),
        (F.col("value") % 3).cast("string").alias("event_type"),
        (F.col("value") % 7).cast("double").alias("value"),
    )
    windowed = windowed_event_counts(events, window_len="10 seconds", watermark="30 seconds")
    q = (
        windowed.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("update")
        .start()
    )
    try:
        ok = _run_until(q, lambda: spark.sql("SELECT * FROM win_out").count() > 0)
        assert ok, "no windowed output produced"
        cols = set(spark.table("win_out").columns)
        assert {"window_start", "window_end", "event_type", "n_events", "sum_value"} <= cols
    finally:
        q.stop()
