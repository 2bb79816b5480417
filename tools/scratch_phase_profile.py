"""Scratch: per-phase timings of process_batch at a given SF (uses the
engine's first-class `timings` hook), plus full_sync decomposition."""
import sys
import time

from pgsync_spark import Catalog, get_spark, schemas, caching
from pgsync_spark.queries import _incremental_events
from pgsync_spark.streaming import IncrementalEngine, payloads_from_rows

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spark = get_spark("phase-profile")
cat = Catalog(spark, SF)
eng = IncrementalEngine(spark, schemas.tree("orders_full"), cat)

t0 = time.perf_counter(); eng.full_sync(); t1 = time.perf_counter()
eng2_t = t1 - t0
t0 = time.perf_counter(); eng.full_sync(); t1 = time.perf_counter()
print(f"full_sync cold {eng2_t:.2f}s warm {t1-t0:.2f}s")

events = payloads_from_rows(spark, _incremental_events(spark, cat)).localCheckpoint(eager=True)
eng.process_batch(events)  # cold
for i in range(N):
    timings = {}
    t0 = time.perf_counter()
    eng.process_batch(events, timings=timings)
    total = time.perf_counter() - t0
    print(f"batch {i}: total {total:.2f}s  " + "  ".join(f"{k}={v}" for k, v in timings.items()))
caching.release_local_checkpoint(events)
eng._teardown_stores()
