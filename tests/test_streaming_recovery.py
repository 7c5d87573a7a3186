"""Streaming checkpoint recovery — the Structured-Streaming analog of
the reference's master-state checkpointing (master/recovery.go:278-300
gob-encodes phase state to S3; a replica restores and resumes).  Here
the engine stops a stateful aggregation mid-stream and restarts it
from the checkpoint: source offsets AND aggregation state must resume,
not reset.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.streaming]


def _counts(spark, table):
    return {
        r["k"]: r["cnt"]
        for r in spark.sql(f"SELECT k, cnt FROM {table}").collect()
    }


def test_stateful_aggregation_survives_restart(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")

    def start(query_name):
        src = (
            spark.readStream.format("rate").option("rowsPerSecond", "200").load()
            .select((F.col("value") % 5).alias("k"))
        )
        agg = src.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
        return (
            agg.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start("rec_run1")
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            q1.processAllAvailable()
            before = _counts(spark, "rec_run1")
            if len(before) == 5 and all(v > 20 for v in before.values()):
                break
            time.sleep(0.2)
        assert len(before) == 5, f"stream made no progress: {before}"
    finally:
        q1.stop()  # "master crash"

    # restart from the SAME checkpoint: offsets + state store restore
    q2 = start("rec_run2")
    try:
        deadline = time.time() + 60
        after = {}
        while time.time() < deadline:
            q2.processAllAvailable()
            after = _counts(spark, "rec_run2")
            if len(after) == 5:
                break
            time.sleep(0.2)
        # recovered state: every key's count continues from ≥ its
        # pre-crash value (a reset would restart near zero)
        assert len(after) == 5, f"no output after restart: {after}"
        for k, v in before.items():
            assert after[k] >= v, f"state lost for key {k}: {v} -> {after[k]}"
    finally:
        q2.stop()
