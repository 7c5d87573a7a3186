"""RocksDB state store under the stateful streaming operators — the
LARGE-STATE posture for 100 TB streams: the default HDFS-backed state
store holds every key in executor heap, which caps streaming state at
memory scale; RocksDB spills state to local disk with incremental
changelog checkpointing and is the provider any production deployment
of these operators would run.  These tests prove the engine's stateful
operators are provider-agnostic: identical results under both stores,
and the RocksDB provider verifiably ENGAGED (its custom metrics appear
in the query progress), not silently fallen back.

The provider is a per-query-start SQLConf read, so flipping
``spark.sql.streaming.stateStore.providerClass`` on the shared session
(restored in ``finally``) is the supported switch — the same conf a
cluster job sets.
"""

from __future__ import annotations

import json
import time

import pytest

from pyspark.sql import functions as F

from mapreduce_faultolerrant_localityaware_spark.streaming import windowed_event_counts
from mapreduce_faultolerrant_localityaware_spark.streaming.materialize import (
    run_to_batch,
    stream_table,
)

pytestmark = [pytest.mark.slow, pytest.mark.streaming]

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def _canon(df):
    return sorted(tuple(str(v) for v in row) for row in df.collect())


@pytest.fixture()
def rocksdb_conf(spark):
    """Flip the session to the RocksDB provider; restore afterwards."""
    try:
        prev = spark.conf.get(_PROVIDER_KEY)
    except Exception:  # noqa: BLE001 — unset in fresh sessions
        prev = None
    spark.conf.set(_PROVIDER_KEY, ROCKSDB)
    yield
    if prev is None:
        spark.conf.unset(_PROVIDER_KEY)
    else:
        spark.conf.set(_PROVIDER_KEY, prev)


def test_rocksdb_tumbling_counts_match_default_store(spark, sf_dir, rocksdb_conf):
    """The watermarked tumbling aggregation replay produces
    BIT-IDENTICAL results under RocksDB and (by the committed
    streaming_tumbling gate) the DuckDB oracle — state backend is an
    execution detail, never a semantics change."""
    ev = stream_table(spark, sf_dir, "events")
    got = _canon(
        run_to_batch(
            windowed_event_counts(ev, window_len="1 hour", watermark="2 hours"),
            spark,
        )
    )
    # reference run under the default HDFS-backed provider
    spark.conf.set(
        _PROVIDER_KEY,
        "org.apache.spark.sql.execution.streaming."
        "state.HDFSBackedStateStoreProvider",
    )
    ev2 = stream_table(spark, sf_dir, "events")
    want = _canon(
        run_to_batch(
            windowed_event_counts(ev2, window_len="1 hour", watermark="2 hours"),
            spark,
        )
    )
    assert got == want
    assert len(got) > 0


def test_rocksdb_provider_actually_engages(spark, rocksdb_conf):
    """Negative control against silent fallback: the finished query's
    state-operator progress must carry RocksDB custom metrics (the
    HDFS-backed store reports none of the rocksdb* keys)."""
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "500").load()
        .select((F.col("value") % 10).alias("k"))
    )
    agg = src.groupBy("k").count()
    q = (
        agg.writeStream.format("noop")
        .outputMode("update")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        metrics = {}
        while time.time() < deadline:
            p = q.lastProgress
            if p:
                prog = json.loads(p) if isinstance(p, str) else p
                ops = prog.get("stateOperators") or []
                if ops and ops[0].get("customMetrics"):
                    metrics = ops[0]["customMetrics"]
                    if metrics:
                        break
            time.sleep(0.5)
    finally:
        q.stop()
    rocks_keys = [k for k in metrics if "rocksdb" in k.lower()]
    assert rocks_keys, f"no rocksdb metrics in state operator: {sorted(metrics)}"
