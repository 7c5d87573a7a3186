import sys, re
sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod
from mapreduce_faultolerrant_localityaware_spark.session import get_spark
from mapreduce_faultolerrant_localityaware_spark.plans.introspect import (
    walk_plan, unpartitioned_windows, is_domain_collapsed, _named_expr_strings,
)
spark = get_spark("dbg3", shuffle_partitions=8)
sf = "/root/testdata/sf0.001"
for name in sys.argv[1:]:
    df = entry_mod.queries()[name](spark, sf)
    print("===", name)
    for win, child in unpartitioned_windows(df):
        if is_domain_collapsed(child):
            continue
        for node in walk_plan(child):
            if "Aggregate" in node.nodeName():
                ks = node.groupingExpressions()
                keys = [ks.apply(i).toString() for i in range(ks.size())]
                types = []
                for i in range(ks.size()):
                    try: types.append(ks.apply(i).dataType().typeName())
                    except Exception as e: types.append(f"err:{e}")
                print("  AGG keys:", keys, types)
                break
        for node in walk_plan(child):
            for s in _named_expr_strings(node):
                if " AS " in s and len(s) < 200:
                    print("  DEF:", s)
        break
