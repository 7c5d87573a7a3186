"""Stateful streaming sessionization via ``applyInPandasWithState``.

The custom-stateful-operator pattern: per-key (user) state carries the
open session (start, last-seen, count); each micro-batch folds new
events in event-time order, closing the session when the gap exceeds
``gap_minutes`` and emitting one row per update.  State is
checkpointed by Structured Streaming — executor loss replays from the
write-ahead log, the engine-level fault tolerance the reference built
by hand (master/recovery.go) for its batch reducers.

Scale: state is O(active users), each entry 3 numbers; per-batch work
is grouped by user_id so it shards across executors with the shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start_us", T.LongType(), False),
        T.StructField("session_end_us", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("closed", T.BooleanType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start_us", T.LongType(), False),
        T.StructField("last_ts_us", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming ``DataFrame[user_id, ts, ...]`` → per-user session rows.

    Emits the open session (closed=False) on every update and a final
    closed=True row when a gap ends it.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        start, last, n = state.get if state.exists else (None, None, 0)
        out = []
        ts_us = sorted(
            int(t.value // 1000) if hasattr(t, "value") else int(t)
            for pdf in pdfs
            for t in pd.to_datetime(pdf["ts"]).astype("int64") // 1000
        )
        for t in ts_us:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                out.append((user_id, start, last, n, True))
                start, last, n = t, t, 1
            else:
                last, n = max(last, t), n + 1
        if start is not None:
            state.update((start, last, n))
            out.append((user_id, start, last, n, False))
        yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return events.groupBy("user_id").applyInPandasWithState(
        fold, OUTPUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
