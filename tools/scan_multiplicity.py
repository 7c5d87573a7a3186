"""Audit table-scan multiplicity: for every ``queries()`` entry, count
FileScan nodes per source table in the physical plan and compare with
the number of DISTINCT tables touched.

A query whose plan contains many more scans than tables re-evaluates a
shared subtree per consumer branch (AQE does NOT reuse the shared
aggregate stage across branches — measured in round 11 with a minimal
probe; see operators/graph.py:modularity).  At 100 TB every extra scan
is a full corpus read, so the worst offenders are checkpoint/persist
candidates (the js_divergence / modularity scan-once discipline).

Usage: python tools/scan_multiplicity.py [min_excess] [query ...]
Prints ``query  n_scans  by-table`` sorted by excess, worst first.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from mapreduce_faultolerrant_localityaware_spark.session import get_spark

SKIP = {"dedup_clusters"}


def main() -> None:
    args = sys.argv[1:]
    min_excess = int(args[0]) if args and args[0].isdigit() else 1
    only = set(args[1:]) if args and args[0].isdigit() else set(args)
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("scan-audit", shuffle_partitions=8)
    rows = []
    for name, fn in sorted(entry_mod.queries().items()):
        if name in SKIP or (only and name not in only):
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # streaming entries etc.
            print(f"-- {name}: skipped ({type(exc).__name__})", file=sys.stderr)
            continue
        tabs = Counter(
            re.search(r"(\w+)\.parquet", m).group(1)
            for m in re.findall(r"FileScan \S+ \S*?\[[^\]]*\][^\n]*", plan)
            if re.search(r"(\w+)\.parquet", m)
        )
        n_scans = sum(tabs.values())
        excess = n_scans - len(tabs)
        if excess >= min_excess:
            rows.append((excess, n_scans, name, dict(tabs)))
    rows.sort(reverse=True)
    for excess, n_scans, name, tabs in rows:
        print(f"{name:32s} scans={n_scans:3d} excess={excess:3d} {tabs}")


if __name__ == "__main__":
    main()
