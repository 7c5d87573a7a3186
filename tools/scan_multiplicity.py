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
       python tools/scan_multiplicity.py --json [query ...]
Prints ``query  n_scans  by-table`` sorted by excess, worst first.
``--json`` (re)writes ``tests/scan_budget.json`` — the per-query
total-scan RATCHET test_plan_hygiene enforces (scans in the FINAL
plan: a materialize_once subtree reads its input once at checkpoint
materialization and then feeds consumers as an RDD scan, so fully
checkpoint-fed queries legitimately pin at 0): a refactor that adds a
duplicate base-table scan to any query fails the suite, exactly like
the exchange-count ratchet; an intentional change regenerates the
budget in the same commit.  With query args, only those entries are
updated inside the existing file.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import __spark_entry__ as entry_mod
from mapreduce_faultolerrant_localityaware_spark.plans.introspect import (
    formatted_plan,
    scan_counts_from_plan,
)
from mapreduce_faultolerrant_localityaware_spark.session import get_spark

SKIP = {"dedup_clusters"}
BUDGET_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "scan_budget.json",
)



def main() -> None:
    args = sys.argv[1:]
    as_json = bool(args) and args[0] == "--json"
    if as_json:
        args = args[1:]
    min_excess = int(args[0]) if args and args[0].isdigit() else 1
    only = set(args[1:]) if args and args[0].isdigit() else set(args)
    if as_json:
        only = set(args)
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("scan-audit", shuffle_partitions=8)
    rows = []
    for name, fn in sorted(entry_mod.queries().items()):
        if name in SKIP or (only and name not in only):
            continue
        try:
            df = fn(spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as exc:  # streaming entries etc.
            print(f"-- {name}: skipped ({type(exc).__name__})", file=sys.stderr)
            continue
        tabs = scan_counts_from_plan(plan)
        n_scans = sum(tabs.values())
        excess = n_scans - len(tabs)
        if as_json or excess >= min_excess:
            rows.append((excess, n_scans, name, dict(tabs)))
    rows.sort(reverse=True)
    for excess, n_scans, name, tabs in rows:
        print(f"{name:32s} scans={n_scans:3d} excess={excess:3d} {tabs}")
    if as_json:
        budget: dict[str, int] = {}
        if only and os.path.exists(BUDGET_PATH):
            with open(BUDGET_PATH) as fh:
                budget = json.load(fh)
        budget.update({name: n for _, n, name, _ in rows})
        with open(BUDGET_PATH, "w") as fh:
            json.dump(budget, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"wrote {len(budget)} scan budgets -> {BUDGET_PATH}")


if __name__ == "__main__":
    main()
