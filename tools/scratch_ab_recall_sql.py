"""Scratch: interleaved A/B of ann_recall_eval with the one-SQL
construction ON vs OFF (Column twin), bench methodology (fn + count),
same process, same window."""
import statistics
import sys
import time

from pgsync_spark import Catalog, caching, get_spark
from pgsync_spark.functions import similarity as S
from pgsync_spark.queries import REGISTRY

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
spark = get_spark("ab-recall-sql")
fn = REGISTRY["ann_recall_eval"].fn


def run_once():
    t0 = time.perf_counter()
    df = fn(spark, SF)
    df.count()
    dt = time.perf_counter() - t0
    caching.release(df)
    return dt


# warm both paths (codegen, trained cache, reader cache)
for flag in (True, False):
    S._SQL_RECALL_EVAL = flag
    run_once()

res = {True: [], False: []}
for _ in range(ROUNDS):
    for flag in (True, False):
        S._SQL_RECALL_EVAL = flag
        res[flag].append(round(run_once(), 3))

S._SQL_RECALL_EVAL = True
for flag, label in ((True, "SQL on "), (False, "Column ")):
    ss = res[flag]
    print(f"{label}: median {statistics.median(ss):.3f}  min {min(ss):.3f}  {ss}")
