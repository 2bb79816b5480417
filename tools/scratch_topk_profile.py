"""Scratch: VectorIndex.topk serving-path cost split — py4j
round-trips (noise-immune) + wall time for (a) DataFrame construction
and (b) the count() action, mirroring the bench's ann_topk_serving."""
import cProfile
import pstats
import sys
import time

from pyspark.sql import functions as F

from pgsync_spark import get_spark
from pgsync_spark.functions.vector_index import VectorIndex
from pgsync_spark.functions.similarity import N_QUERIES

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark("topk-profile")
emb = spark.read.parquet(f"{SF}/embeddings.parquet")
vidx = VectorIndex(spark)
vidx.ingest(emb)
q = emb.filter(F.col("vec_id") < N_QUERIES).select(
    F.col("vec_id").alias("query_id"), "embedding"
)

# warm
vidx.topk(q, exclude_self=True).count()


def rt_count(fn):
    pr = cProfile.Profile()
    pr.enable()
    out = fn()
    pr.disable()
    st = pstats.Stats(pr)
    n = 0
    for (filename, _lineno, name), stat in st.stats.items():
        if name == "send_command" and "java_gateway" in filename:
            n = max(n, stat[0])
    return out, n, st


for _ in range(3):
    t0 = time.perf_counter()
    df = vidx.topk(q, exclude_self=True)
    t1 = time.perf_counter()
    df.count()
    t2 = time.perf_counter()
    print(f"construct {1000*(t1-t0):.0f} ms  count {1000*(t2-t0):.0f} ms total")

df, n, st = rt_count(lambda: vidx.topk(q, exclude_self=True))
print(f"construction round-trips: {n}")
_, n2, st2 = rt_count(lambda: vidx.topk(q, exclude_self=True).count())
print(f"construct+count round-trips: {n2}")
if len(sys.argv) > 2 and sys.argv[2] == "-v":
    st.sort_stats("cumulative").print_stats(25)
vidx.close()
