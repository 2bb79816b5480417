"""Scratch: split ann_recall_eval into construction vs execution wall.

Constructs once (warm), then times .count() alone on fresh
constructions — the action re-runs everything except the already-
persisted artifacts, mirroring the bench's fn+count loop split.
"""
import sys
import time

from pgsync_spark import caching, get_spark
from pgsync_spark.queries import REGISTRY

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("recall-split")
fn = REGISTRY["ann_recall_eval"].fn

df = fn(spark, SF)
df.count()  # warm codegen
caching.release(df)

for i in range(3):
    t0 = time.perf_counter()
    df = fn(spark, SF)
    t1 = time.perf_counter()
    n = df.count()
    t2 = time.perf_counter()
    caching.release(df)
    print(
        f"run {i}: construct {t1-t0:6.2f}s  count {t2-t1:6.2f}s  "
        f"total {t2-t0:6.2f}s  rows {n}"
    )
