"""Scratch: interleaved A/B of the small single-parse/one-SQL
conversions ON vs OFF (bench methodology, same window)."""
import statistics
import sys
import time

from pgsync_spark import caching, get_spark
import pgsync_spark.queries as Q

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
NAMES = [
    "ccnet_perplexity_buckets",
    "ccnet_perplexity_buckets_sampled",
    "dsir_select",
]
spark = get_spark("ab-small-sql")

def run_once(fn):
    t0 = time.perf_counter()
    df = fn(spark, SF)
    df.count()
    dt = time.perf_counter() - t0
    caching.release(df)
    return dt

for name in NAMES:
    fn = Q.REGISTRY[name].fn
    res = {True: [], False: []}
    for flag in (True, False):
        Q._SQL_TEXTQ = flag
        run_once(fn)
    for _ in range(ROUNDS):
        for flag in (True, False):
            Q._SQL_TEXTQ = flag
            res[flag].append(round(run_once(fn), 3))
    Q._SQL_TEXTQ = True
    print(
        f"{name:34s} sql median {statistics.median(res[True]):.3f} "
        f"(min {min(res[True]):.3f}) | col median "
        f"{statistics.median(res[False]):.3f} (min {min(res[False]):.3f})"
    )
