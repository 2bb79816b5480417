"""Scratch: hotspot breakdown of ann_recall_eval CONSTRUCTION (no action).

Warm twice (trained-artifact memo, reader cache), then cProfile one
construction and print the top cumulative-time entries plus the py4j
round-trip count split by caller module.
"""
import cProfile
import pstats
import sys
import time

from pgsync_spark import caching, get_spark
from pgsync_spark.queries import REGISTRY

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
NAME = sys.argv[2] if len(sys.argv) > 2 else "ann_recall_eval"

spark = get_spark("recall-hotspots")
fn = REGISTRY[NAME].fn
for _ in range(2):
    df = fn(spark, SF)
    caching.release(df)

t0 = time.perf_counter()
pr = cProfile.Profile()
pr.enable()
df = fn(spark, SF)
pr.disable()
wall = time.perf_counter() - t0
caching.release(df)
print(f"construct wall {wall*1000:.0f} ms")

st = pstats.Stats(pr)
st.sort_stats("cumulative")
st.print_stats(35)
