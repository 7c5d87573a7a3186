"""Physical-plan introspection — the scale guardrails.

These assertions encode the properties that matter at 100 TB and are
invisible in small-data correctness tests: filters reaching the
parquet scan, dimension joins going broadcast, hot paths staying
inside whole-stage codegen (no Python UDF).  Tests call these so a
regression in plan shape fails CI, not the cluster bill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def assert_pushed_filters(df: DataFrame, *needles: str) -> None:
    """Assert the formatted plan shows parquet PushedFilters mentioning
    each needle (column name or literal)."""
    plan = formatted_plan(df)
    assert "PushedFilters" in plan, f"no PushedFilters in plan:\n{plan}"
    for needle in needles:
        assert needle in plan, f"{needle!r} not pushed down:\n{plan}"


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"expected a broadcast join:\n{plan}"
    )


def assert_no_python_udf(df: DataFrame) -> None:
    """Hot-path queries must stay JVM-side (no BatchEvalPython /
    ArrowEvalPython nodes)."""
    plan = formatted_plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, f"Python UDF in hot path:\n{plan}"
