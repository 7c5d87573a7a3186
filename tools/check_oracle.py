"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables; compare row count, column names, and
order-insensitive values (floats rounded to 6 dp).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py --json OUT.json [sf_dir] [query ...]
       python tools/check_oracle.py --merge --json OUT.json [sf_dir] [query ...]

``--merge`` updates only the queries run this invocation inside an
existing artifact (incremental refresh after adding an operator);
without it ``--json`` rewrites the file with exactly the queries run.

With ``--json`` every query's outcome is also written in the driver's
CORRECTNESS schema (``rows_match``/``schema_match``/``hash_match``/
``spark_rows``/``oracle_rows``/``err`` per query) so a committed
full-surface artifact can be regenerated each round.
"""

from __future__ import annotations

import json
import math
import sys
import time
import traceback

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry_mod
from mapreduce_faultolerrant_localityaware_spark.session import get_spark
from mapreduce_faultolerrant_localityaware_spark.sources.scans import TABLES


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = 0.0 if (not math.isnan(v) and round(v, 6) == 0) else round(v, 6)
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main():
    args = sys.argv[1:]
    json_out = None
    merge = False
    if args and args[0] == "--merge":
        merge = True
        args = args[1:]
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    # keep spill out of the repo and BOUNDED: a pathological oracle
    # (round 6: an inverted-index self-join the optimizer mis-ordered)
    # must fail fast with a temp-space error, not fill the disk.
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    con.execute("SET max_temp_directory_size='24GB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        report[name] = rec
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            rec["err"] = traceback.format_exc()[-1500:]
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        rec["spark_rows"] = len(srows)
        sql = oracles.get(name)
        if sql is None:
            # explicit marker: rows-only by design (approximate/sketch
            # queries with pytest accuracy bounds instead of a SQL
            # oracle) — distinguishable in the artifact from not-run
            rec["rows_only"] = True
            print(f"SKIP {name}: no oracle, rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            rec["err"] = traceback.format_exc()[-1500:]
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            continue
        dt = time.time() - t0
        rec["oracle_rows"] = len(orows)
        rec["rows_match"] = len(srows) == len(orows)
        rec["schema_match"] = sorted(scols) == sorted(ocols)
        if not rec["schema_match"]:
            failures.append(name)
            print(f"FAIL {name}: columns {sorted(scols)} != {sorted(ocols)}")
            continue
        if not rec["rows_match"]:
            failures.append(name)
            print(f"FAIL {name}: rows {len(srows)} != {len(orows)}")
            continue
        cs, co = canon(srows, scols), canon(orows, ocols)
        rec["hash_match"] = cs == co
        if not rec["hash_match"]:
            failures.append(name)
            diff = [(a, b) for a, b in zip(cs, co) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs: {diff}")
            continue
        print(f"OK   {name}: {len(srows)} rows, {dt:.1f}s")
    if json_out:
        if merge:
            # incremental refresh: update only the queries run this
            # invocation, keep every other entry of the existing artifact
            try:
                with open(json_out) as f:
                    prior = json.load(f)
            except FileNotFoundError:
                prior = {}
            prior.update(report)
            # keep artifact key order aligned with queries() ordering
            report = {k: prior[k] for k in qs if k in prior}
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_out} ({len(report)} queries)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
