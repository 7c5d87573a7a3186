"""Event-stream batch operators — JSON property extraction, ordered
windows (lag), and gap-based sessionization.

All built-ins: JSON parsing via get_json_object (JVM-side Jackson),
sessionization as the classic two-window composition (lag → gap flag →
running sum), which shuffles once per window partition key and scales
with the per-user event count, not the total row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def extract_json_prop(
    events: DataFrame, prop_path: str = "$.k", props_col: str = "props", out: str = "k"
) -> DataFrame:
    """Pull a typed scalar out of a JSON properties column."""
    return events.withColumn(out, F.get_json_object(F.col(props_col), prop_path).cast("long"))


def variant_prop(
    events: DataFrame, prop_path: str = "$.k", props_col: str = "props", out: str = "k"
) -> DataFrame:
    """Open-schema property access via the VARIANT type (Spark 4):
    ``parse_json`` binary-encodes the document once and
    ``try_variant_get`` does typed path access on the encoded form —
    at lake scale the parse cost is paid per ROW at ingest/scan, not
    per extracted path per query, which is the difference between one
    and N Jackson passes when a query touches many properties of a
    wide event document."""
    v = F.parse_json(F.col(props_col))
    return events.withColumn(out, F.try_variant_get(v, prop_path, "long"))


def with_lag(
    events: DataFrame,
    value_col: str = "value",
    user_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    return events.withColumn("prev_value", F.lag(value_col).over(w))


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign gap-based session ids per user: a new session starts when
    the time since the previous event exceeds ``gap_minutes``.

    Both windows share the same partitioning (user) and ordering, so
    Spark plans ONE exchange + sort and evaluates lag and the running
    sum in the same window stage.
    """
    # integer microseconds, not float seconds: exact gap comparison,
    # portable to any µs-precision oracle
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    gap = F.unix_micros(F.col(ts_col)) - F.lag(F.unix_micros(F.col(ts_col))).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_id", F.sum(new_session).over(running).cast("long"))
