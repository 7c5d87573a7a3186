"""Full-surface empty-input sweep: EVERY ``queries()`` entry must run
on EMPTY source tables and return a schema-stable (possibly empty)
result — no errors, no schema drift vs the populated-table plan.

The reference's own abandoned test (``test/map_red_test.go``) died on
exactly this class of edge (empty input splits); this sweep pins the
whole declared-query surface against it.  Empty tables are written ONCE per
session with the real parquet schemas (read from sf0.001 footers), so
schema-branching scans (events ts micros/nanos) take the same path.

Global aggregates legitimately return 1 row on empty input (SQL
semantics: COUNT(*) over empty = 0); everything else returns 0 rows.
The assertion is execution success + schema equality, not row count.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

pytestmark = [pytest.mark.slow]

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

_QUERIES = sorted(entry_mod.queries())


@pytest.fixture(scope="session")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = spark.read.parquet(f"{sf_dir}/{t}.parquet").schema
        spark.createDataFrame([], schema).write.parquet(
            str(root / f"{t}.parquet")
        )
    return str(root)


@pytest.mark.parametrize("name", _QUERIES)
def test_query_on_empty_tables(spark, sf_dir, empty_sf_dir, name):
    q = entry_mod.queries()[name]
    # the populated-table plan is the schema reference (never executed)
    ref_schema = q(spark, sf_dir).schema
    out = q(spark, empty_sf_dir)
    rows = out.collect()  # must execute without error; output is tiny
    assert out.schema == ref_schema, (
        f"{name}: schema drift on empty input\n"
        f"  empty: {out.schema.simpleString()}\n"
        f"  real:  {ref_schema.simpleString()}"
    )
    assert isinstance(rows, list)
