import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import __spark_entry__ as entry_mod
from mapreduce_faultolerrant_localityaware_spark.session import get_spark
from mapreduce_faultolerrant_localityaware_spark.plans import formatted_plan
from mapreduce_faultolerrant_localityaware_spark.plans.introspect import (
    is_domain_collapsed, unpartitioned_windows, bnlj_build_sides, is_row_bounded, subtree_sketch)
spark = get_spark("sweep2", shuffle_partitions=8)
sf = "/root/testdata/sf0.001"
for name in sys.argv[1:]:
    df = entry_mod.queries()[name](spark, sf)
    plan = formatted_plan(df)
    bad_w = [c for _, c in unpartitioned_windows(df) if not is_domain_collapsed(c)]
    bad_b = [b for _, b in bnlj_build_sides(df) if not is_row_bounded(b)]
    print(name, "bnlj:", "BroadcastNestedLoopJoin" in plan, "badwin:", len(bad_w), "badbnlj:", len(bad_b))
    for c in bad_w[:1]:
        print(subtree_sketch(c, max_lines=10))
