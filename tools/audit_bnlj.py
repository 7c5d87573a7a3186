"""Exploratory: for each BNLJ_OK query, walk the physical plan tree and
print each BroadcastNestedLoopJoin's build-side subtree node names plus
the build child's logical maxRows, to design the programmatic bound
assertion (VERDICT r7 item 3)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import __spark_entry__ as entry_mod
from mapreduce_faultolerrant_localityaware_spark.session import get_spark
from tests.test_plan_hygiene import BNLJ_OK


def children(node):
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        return [node.initialPlan()]
    if name.startswith("InMemoryTableScan"):
        try:
            return [node.relation().cachedPlan()]
        except Exception:  # noqa: BLE001
            pass
    seq = node.children()
    return [seq.apply(i) for i in range(seq.length())]


def walk(node):
    yield node
    for c in children(node):
        yield from walk(c)


def subtree_names(node, depth=0):
    name = node.nodeName()
    extra = ""
    if "Aggregate" in name:
        try:
            extra = f" [groupKeys={node.groupingExpressions().length()}]"
        except Exception:  # noqa: BLE001
            pass
    if name == "Filter":
        try:
            extra = f" [cond={node.condition().toString()[:120]}]"
        except Exception:  # noqa: BLE001
            pass
    lines = ["  " * depth + name + extra]
    for c in children(node):
        lines.extend(subtree_names(c, depth + 1))
    return lines


def max_rows(node):
    try:
        link = node.logicalLink()
        if link.isDefined():
            mr = link.get().maxRows()
            return mr.get() if mr.isDefined() else None
    except Exception as e:  # noqa: BLE001
        return f"err:{e}"
    return "nolink"


def main():
    spark = get_spark("audit-bnlj")
    sf_dir = "/root/testdata/sf0.001"
    qs = entry_mod.queries()
    for name in sorted(BNLJ_OK):
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan()
        found = False
        for node in walk(plan):
            if "BroadcastNestedLoopJoin" in node.nodeName():
                found = True
                build = node.buildSide().toString()
                idx = 0 if build == "BuildLeft" else 1
                bchild = children(node)[idx]
                print(f"== {name}: build={build} maxRows={max_rows(bchild)}")
                print("\n".join(subtree_names(bchild)[:12]))
        if not found:
            print(f"== {name}: NO BNLJ in executedPlan")
    spark.stop()


if __name__ == "__main__":
    main()
