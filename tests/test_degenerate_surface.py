"""Full-surface ALL-NULL / degenerate-column sweep (VERDICT r8 item 4):
every ``queries()`` entry must run on POPULATED tables whose optional
payload columns are degenerate — NULL text/lang/source, NULL event
value/props, zero-vector embeddings, NULL descriptive strings — and
return a schema-stable result without an ANSI crash.

This is the edge class the empty-table sweep (zero rows) cannot reach:
rows EXIST, so per-row expressions actually evaluate — NULL tokenize
feeds, NULL group keys, zero-norm cosine denominators — and every
``try_divide``/null-guard either holds or crashes loudly here instead
of on a cluster.  Keys and timestamps stay populated (they are the
relational skeleton; a NULL join key is the empty sweep in disguise).

The assertion is execution success + schema equality vs the
populated-table plan, same contract as tests/test_empty_surface.py.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

from pyspark.sql import functions as F

pytestmark = [pytest.mark.slow]

#: per-table degenerate projections: column → replacement expression
#: (None means NULL of the original type)
_DEGENERATE: dict[str, dict[str, object]] = {
    "documents": {"text": None, "lang": None, "source": None, "n_chars": None},
    "events": {"value": None, "props": None},
    # zero vector, SAME per-row dimensionality (the cosine/norm
    # denominators go to exactly 0.0, the worst defined-input case);
    # sentinel resolved lazily in the fixture — building a Column
    # needs an active session
    "embeddings": {"embedding": "ZERO_VEC", "label": None},
    "orders": {"o_orderstatus": None, "o_orderpriority": None},
    "lineitem": {"l_returnflag": None, "l_linestatus": None},
    "customer": {"c_name": None, "c_mktsegment": None},
    "part": {"p_name": None, "p_brand": None, "p_type": None},
    "supplier": {"s_name": None},
    "nation": {"n_name": None},
    "region": {"r_name": None},
}

_QUERIES = sorted(entry_mod.queries())


@pytest.fixture(scope="session")
def degenerate_sf_dir(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("degenerate_sf")
    for t, repl in _DEGENERATE.items():
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        types = dict(df.dtypes)
        cols = []
        for c in df.columns:
            r = repl.get(c, False)
            if r is False:
                cols.append(F.col(c))
            elif r is None:
                cols.append(F.lit(None).cast(types[c]).alias(c))
            elif r == "ZERO_VEC":
                cols.append(
                    F.transform(c, lambda x: x * F.lit(0.0).cast("float"))
                    .cast(types[c])
                    .alias(c)
                )
            else:
                cols.append(r.cast(types[c]).alias(c))
        df.select(*cols).write.parquet(str(root / f"{t}.parquet"))
    return str(root)


@pytest.mark.parametrize("name", _QUERIES)
def test_query_on_degenerate_tables(spark, sf_dir, degenerate_sf_dir, name):
    q = entry_mod.queries()[name]
    # the populated-table plan is the schema reference (never executed)
    ref_schema = q(spark, sf_dir).schema
    out = q(spark, degenerate_sf_dir)
    # noop-sink write: every partition of every output column executes
    # (a limited collect could leave an ANSI crash in an unread
    # partition undetected)
    out.write.format("noop").mode("overwrite").save()
    assert out.schema == ref_schema, (
        f"{name}: schema drift on degenerate input\n"
        f"  degenerate: {out.schema.simpleString()}\n"
        f"  real:       {ref_schema.simpleString()}"
    )
