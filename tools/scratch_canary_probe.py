"""Scratch: quick ambient-noise probe — the bench's canary query alone.
Prints the median of 5 samples; clean windows on this host read
~0.07-0.12 s. Used to gate full-bench attempts on host calm."""
import os
import statistics
import sys
import time

from pgsync_spark import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("canary-probe")
path = os.path.join(SF, "orders.parquet")
spark.read.parquet(path).count()  # untimed JIT warm
samples = []
for _ in range(5):
    t0 = time.perf_counter()
    spark.read.parquet(path).count()
    samples.append(time.perf_counter() - t0)
print(f"canary median {statistics.median(samples):.4f} "
      f"({[round(s, 4) for s in samples]})")
