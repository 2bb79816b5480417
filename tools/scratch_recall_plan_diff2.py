"""Scratch: substring-count plan comparison SQL vs Column recall eval."""
import sys

from pgsync_spark import Catalog, caching, get_spark
from pgsync_spark.functions import similarity as S

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("recall-plan-diff2")
df = Catalog(spark, SF).df("embeddings")

def fmt(d):
    return d._sc._jvm.PythonSQLUtils.explainString(
        d._jdf.queryExecution(), "formatted")

a = S.ann_recall_eval(df)
pa = fmt(a)
b = S._recall_eval_df(df)
pb = fmt(b)

for k in ["Exchange", "BroadcastExchange", "BroadcastHashJoin",
          "BroadcastNestedLoopJoin", "SortMergeJoin", "Window",
          "HashAggregate", "InMemoryTableScan", "Union", "Generate",
          "CartesianProduct"]:
    va, vb = pa.count(f" {k} "), pb.count(f" {k} ")
    flag = "" if va == vb else "   <-- DIFF"
    print(f"{k:26s} sql {va:4d}  col {vb:4d}{flag}")
print("plan chars:", len(pa), "vs", len(pb))
with open("/tmp/recall_sql_plan.txt", "w") as f:
    f.write(pa)
with open("/tmp/recall_col_plan.txt", "w") as f:
    f.write(pb)
caching.release(a); caching.release(b)
