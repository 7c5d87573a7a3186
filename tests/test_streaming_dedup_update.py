"""Pinned boundary semantics of deduped update-mode counts
(streaming/enrich_stream.py:deduped_update_counts, VERDICT r8 item 8):
three hand-built micro-batches walk every edge of
``dropDuplicatesWithinWatermark`` + update-mode aggregation —

  batch 0  A@10:00, B@10:00         → both fresh, count 2
  batch 1  A@10:05 (dup INSIDE the 10-min horizon → dropped),
           C@11:00 (fresh → count updates IN PLACE 2 → 3;
           advances the watermark to 10:50)
  batch 2  A@11:05 — A's dedup state EXPIRED (watermark 10:50 passed
           expiry 10:00+10min) → legitimately re-counted (3 → 4);
           D@10:30 — LATE (older than the previous batch's watermark
           10:50) → filtered before dedup, never counted.

Every boundary is a pure function of the pinned input, which is what
makes the replay deterministic and the expected update log exact.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

from pyspark.sql import functions as F

from mapreduce_faultolerrant_localityaware_spark.streaming.enrich_stream import (
    deduped_update_counts,
)
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.streaming]


def _stage(spark, tmp_path, batches):
    """Write each batch as one pinned single-file parquet (strictly
    increasing mtime+name → deterministic file-source order)."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir, exist_ok=True)
    schema = "k string, g string, ts timestamp"
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, schema)
        tmp = str(tmp_path / f"tmp-{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        dest = os.path.join(in_dir, f"{i:02d}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
        shutil.rmtree(tmp, ignore_errors=True)
    return in_dir, spark.createDataFrame([], schema).schema


def test_dedup_update_counts_boundary_semantics(spark, tmp_path):
    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)
    batches = [
        [("A", "g", t(10, 0)), ("B", "g", t(10, 0))],
        [("A", "g", t(10, 5)), ("C", "g", t(11, 0))],
        [("A", "g", t(11, 5)), ("D", "g", t(10, 30))],
    ]
    in_dir, schema = _stage(spark, tmp_path, batches)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    counts = deduped_update_counts(stream, ["k"], "g", watermark="10 minutes")

    updates = []  # (batch_id, group, n) in emission order

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            updates.append((batch_id, r["g"], r["n_unique"]))

    q = (
        counts.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    by_batch = {}
    for bid, g, n in updates:
        assert g == "g"
        by_batch[bid] = n
    # batch 0: A,B fresh → 2.  batch 1: dup-A dropped, C fresh →
    # in-place update to 3.  batch 2: expired A re-counted, late D
    # filtered → 4.  (Data batches may be followed by no-data batches
    # that emit nothing; only batches that emitted appear here.)
    emitted = [by_batch[k] for k in sorted(by_batch)]
    assert emitted == [2, 3, 4], (updates, emitted)
