"""Scratch: SQL-vs-Column parity smoke for ann_recall_eval + timing."""
import sys
import time

from pgsync_spark import Catalog, caching, get_spark
from pgsync_spark.functions import similarity as S

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("recall-sql-check")
df = Catalog(spark, SF).df("embeddings")

a = S.ann_recall_eval(df)
rows_sql = sorted(tuple(r) for r in a.collect())
caching.release(a)

b = S._recall_eval_df(df)
rows_col = sorted(tuple(r) for r in b.collect())
caching.release(b)

assert [f.name for f in a.schema.fields] == [f.name for f in b.schema.fields], (
    a.schema, b.schema)
assert [f.dataType for f in a.schema.fields] == [
    f.dataType for f in b.schema.fields], (a.schema, b.schema)
assert rows_sql == rows_col, (
    f"n_sql={len(rows_sql)} n_col={len(rows_col)}\n"
    f"only_sql={set(rows_sql)-set(rows_col)}\n"
    f"only_col={set(rows_col)-set(rows_sql)}"
)
print(f"parity OK: {len(rows_sql)} rows byte-equal, schema equal")

fixed = sorted(
    v.name for v in spark.catalog.listTables() if v.name.startswith("__recall_")
)
assert len(fixed) == 8, fixed
print(f"fixed view set bounded: {fixed}")

for label, fn in (("sql", S.ann_recall_eval), ("col", S._recall_eval_df)):
    fn_df = fn(df); fn_df.count(); caching.release(fn_df)  # warm
    for i in range(2):
        t0 = time.perf_counter()
        d = fn(df)
        t1 = time.perf_counter()
        d.count()
        t2 = time.perf_counter()
        caching.release(d)
        print(f"{label} run{i}: construct {t1-t0:5.2f}s count {t2-t1:5.2f}s")
