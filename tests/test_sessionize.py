"""Sessionization tests — batch (window composition) and streaming
(applyInPandasWithState custom stateful operator)."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F

from mapreduce_faultolerrant_localityaware_spark.operators.events import sessionize
from mapreduce_faultolerrant_localityaware_spark.streaming import sessionize_stream


def _ts(minute):
    return dt.datetime(2024, 1, 1, 10, minute)


def test_batch_sessionize_gap_splits(spark):
    rows = [
        (1, 100, _ts(0), 1.0), (2, 100, _ts(5), 1.0),   # session 1
        (3, 100, _ts(50), 1.0),                          # >30min gap → session 2
        (4, 200, _ts(0), 1.0),                           # other user, own session 1
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    out = {r["event_id"]: r["session_id"] for r in sessionize(df, gap_minutes=30).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}


def test_streaming_sessionize_stateful(spark):
    src = spark.readStream.format("rate").option("rowsPerSecond", "20").load()
    events = src.select(
        (F.col("value") % 3).alias("user_id"), F.col("timestamp").alias("ts")
    )
    q = (
        sessionize_stream(events, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("update")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            if spark.sql("SELECT * FROM sess_out").count() > 0:
                break
            time.sleep(0.2)
        rows = spark.sql("SELECT * FROM sess_out").collect()
        assert rows, "no session rows emitted"
        # rate source has no gaps → only open sessions; state accumulates
        assert all(not r["closed"] for r in rows)
        by_user = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append(r["n_events"])
        # n_events grows monotonically per user across updates
        assert all(ns == sorted(ns) for ns in by_user.values())
    finally:
        q.stop()
