"""Scratch: physical-plan shape comparison SQL vs Column recall eval."""
import re
import sys
from collections import Counter

from pgsync_spark import Catalog, caching, get_spark
from pgsync_spark.functions import similarity as S

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("recall-plan-diff")
df = Catalog(spark, SF).df("embeddings")

def shape(d):
    plan = d._jdf.queryExecution().executedPlan().toString()
    ops = Counter(re.findall(r"^\s*[+:*-]*\s*\(?\d*\)?\s*([A-Za-z]+\w*)", plan, re.M))
    return plan, ops

a = S.ann_recall_eval(df)
pa, ca = shape(a)
b = S._recall_eval_df(df)
pb, cb = shape(b)

same = a._jdf.queryExecution().optimizedPlan().sameResult(
    b._jdf.queryExecution().optimizedPlan())
print("sameResult:", same)

keys = ["Exchange", "BroadcastExchange", "BroadcastHashJoin", "SortMergeJoin",
        "BroadcastNestedLoop", "Window", "HashAggregate", "Project", "Filter",
        "InMemoryTableScan", "Scan", "Union", "Generate"]
for k in keys:
    va = sum(v for op, v in ca.items() if op.startswith(k))
    vb = sum(v for op, v in cb.items() if op.startswith(k))
    flag = "" if va == vb else "   <-- DIFF"
    print(f"{k:24s} sql {va:4d}  col {vb:4d}{flag}")
print("plan lines:", len(pa.splitlines()), "vs", len(pb.splitlines()))
caching.release(a); caching.release(b)
