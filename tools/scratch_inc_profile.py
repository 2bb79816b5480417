"""Scratch: phase-level timing of IncrementalEngine.process_batch via
the engine's first-class ``timings`` hook (no mirrored body to drift).

Usage: python scratch_inc_profile.py [n_batches] [sf_dir]
"""
import sys
import time

from pgsync_spark import get_spark, Catalog, schemas
from pgsync_spark.queries import _incremental_events
from pgsync_spark.streaming import IncrementalEngine, payloads_from_rows

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

spark = get_spark("incprof")
cat = Catalog(spark, SF)
eng = IncrementalEngine(spark, schemas.tree("orders_full"), cat)
t0 = time.perf_counter()
eng.full_sync()
print("full_sync %.2f" % (time.perf_counter() - t0), flush=True)
# checkpoint once: a real foreachBatch micro-batch arrives JVM-resident;
# re-serializing the Python row list every batch would profile the
# harness, not the engine
events = payloads_from_rows(spark, _incremental_events(spark, cat)).localCheckpoint(
    eager=True
)

for i in range(N):
    timings: dict[str, float] = {}
    t0 = time.perf_counter()
    eng.process_batch(events, timings=timings)
    total = time.perf_counter() - t0
    parts = " ".join(f"{k}={v:.2f}" for k, v in timings.items())
    print(f"batch{i} total={total:.2f}  {parts}", flush=True)
