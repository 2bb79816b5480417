"""Scratch: interleaved same-process A/B of the full ann_index_topk /
ann_index_cdc_topk registry lifecycles with the one-SQL topk path ON
vs OFF (_SQL_TOPK flag) — adjudicates whether the r14 window deltas on
these metrics are the change or ambient."""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgsync_spark import caching, get_spark
from pgsync_spark.functions.vector_index import VectorIndex
from pgsync_spark.functions.bm25_index import BM25Index
from pgsync_spark.queries import REGISTRY

import bench

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

spark = get_spark("ab-sql-topk")
spark.read.parquet(f"{SF}/orders.parquet").count()

c, cs = bench._canary(spark, SF)
print(f"canary[start]: {c} ({cs})")


def run(name):
    fn = REGISTRY[name].fn
    t0 = time.perf_counter()
    df = fn(spark, SF)
    df.count()
    dt = time.perf_counter() - t0
    caching.release(df)
    return round(dt, 3)


_bm25_sql_topk = BM25Index.topk


def _bm25_col_topk(self, terms, k=10):
    return self._topk_df(terms, k)


def set_path(name, sql_on):
    if name.startswith("bm25"):
        BM25Index.topk = _bm25_sql_topk if sql_on else _bm25_col_topk
    else:
        VectorIndex._SQL_TOPK = sql_on


res = {}
for name in ("ann_index_topk", "ann_index_cdc_topk", "bm25_incremental_topk"):
    on, off = [], []
    # warm both paths once
    set_path(name, True)
    run(name)
    set_path(name, False)
    run(name)
    for _ in range(ROUNDS):
        set_path(name, True)
        on.append(run(name))
        set_path(name, False)
        off.append(run(name))
    set_path(name, True)
    res[name] = (on, off)
    print(
        f"{name}: SQL on median {statistics.median(on)} {on} | "
        f"off median {statistics.median(off)} {off}"
    )

c, cs = bench._canary(spark, SF)
print(f"canary[end]: {c} ({cs})")
