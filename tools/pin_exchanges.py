"""Regenerate the committed per-query exchange budget.

Sweeps every ``queries()`` entry at the TEST scale factor (sf0.001 —
the same files and session config tests/test_plan_hygiene.py explains
against, since join-strategy choice reads file-size stats) and writes
``tests/exchange_budget.json``: query → counts of ``Exchange`` (real
shuffles), ``BroadcastExchange`` and ``ReusedExchange`` physical nodes.

The budget is a RATCHET, not documentation: test_plan_hygiene fails
any query whose plan gained a shuffle or lost an exchange reuse, so an
intentional plan change must regenerate this file in the same commit —
exactly the protection that caught attribution_multi_touch's double
interval-join in round 8 by hand, made mechanical.

Usage: python tools/pin_exchanges.py [query ...]   # no args = full sweep
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from mapreduce_faultolerrant_localityaware_spark.plans.introspect import exchange_counts
from mapreduce_faultolerrant_localityaware_spark.session import get_spark

BUDGET_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "exchange_budget.json",
)

#: iterative driver-loop queries — per-round plans, final frame is a
#: checkpoint scan; mirrors tests/test_plan_hygiene.py SKIP
SKIP = {"dedup_clusters"}


def main() -> None:
    only = set(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("pin-exchanges", shuffle_partitions=8)
    qs = entry_mod.queries()
    budget: dict[str, dict[str, int]] = {}
    if only and os.path.exists(BUDGET_PATH):
        with open(BUDGET_PATH) as fh:
            budget = json.load(fh)
    for name in sorted(qs):
        if name in SKIP or (only and name not in only):
            continue
        budget[name] = exchange_counts(qs[name](spark, sf_dir))
        print(name, budget[name])
    with open(BUDGET_PATH, "w") as fh:
        json.dump(budget, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {len(budget)} budgets -> {BUDGET_PATH}")


if __name__ == "__main__":
    main()
