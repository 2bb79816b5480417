"""Scratch: just the bench's serving section + ann/bm25 index
lifecycle queries, with canary probes — the focused re-measure for
the r14 one-SQL topk change."""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgsync_spark import caching, get_spark
from pgsync_spark.queries import REGISTRY

import bench

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark("serving-bench")
spark.read.parquet(f"{SF}/orders.parquet").count()

c, cs = bench._canary(spark, SF)
print(f"canary[start]: {c} ({cs})")

timings, samples = bench._bench_serving(spark, SF)
print("serving:", timings)

for name in ("ann_index_topk", "ann_index_cdc_topk",
             "bm25_incremental_topk", "bm25_cdc_topk"):
    fn = REGISTRY[name].fn
    ss = []
    for _ in range(3):
        t0 = time.perf_counter()
        df = fn(spark, SF)
        df.count()
        ss.append(round(time.perf_counter() - t0, 3))
        caching.release(df)
    print(f"{name}: median {statistics.median(ss)} runs {ss}")

c, cs = bench._canary(spark, SF)
print(f"canary[end]: {c} ({cs})")
