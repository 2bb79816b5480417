"""Scratch: dedup_canonical phase decomposition + isolated repeats.

Phases: (a) minhash_lsh_pairs materialize, (b) connected_components
over the pairs, (c) canonical_attach + count. Plus a canary probe
(orders scan+count) before/after, the bench's window discipline.
"""
import statistics
import sys
import time

from pyspark.sql import functions as F

from pgsync_spark import get_spark, caching
from pgsync_spark.functions import dedup as dd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4

spark = get_spark("canonical-profile")
docs = spark.read.parquet(f"{SF}/documents.parquet")
orders = f"{SF}/orders.parquet"
spark.read.parquet(orders).count()  # warm


def canary():
    ss = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.read.parquet(orders).count()
        ss.append(time.perf_counter() - t0)
    return round(statistics.median(ss), 4)


print("canary[start]:", canary())

# phase split, repeated
for i in range(N):
    t0 = time.perf_counter()
    lsh = dd.minhash_lsh_pairs(docs)
    n_pairs = lsh.count()
    t1 = time.perf_counter()
    labels = dd.connected_components(lsh.select("id1", "id2"))
    t2 = time.perf_counter()
    out = dd.canonical_attach(
        docs.select("doc_id"),
        labels.select(F.col("id").alias("id"), F.col("label").alias("label")).selectExpr(
            "id", "label"
        ),
        "doc_id",
    )
    n = out.count()
    t3 = time.perf_counter()
    caching.release(lsh)
    caching.release_local_checkpoint(labels)
    print(
        f"run {i}: pairs {t1-t0:.2f}s ({n_pairs} pairs)  cc {t2-t1:.2f}s  "
        f"attach {t3-t2:.2f}s  total {t3-t0:.2f}s ({n} rows)"
    )

# whole-query repeats exactly as the bench runs it
from pgsync_spark.queries import REGISTRY

fn = REGISTRY["dedup_canonical"].fn
for i in range(N):
    t0 = time.perf_counter()
    df = fn(spark, SF)
    n = df.count()
    dt = time.perf_counter() - t0
    caching.release(df)
    print(f"whole {i}: {dt:.2f}s ({n} rows)")

print("canary[end]:", canary())
