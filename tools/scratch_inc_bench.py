"""Scratch: repeatable incremental-engine timing (not part of the suite)."""
import statistics
import sys
import time

from pgsync_spark import get_spark, Catalog, schemas
from pgsync_spark.queries import _incremental_events
from pgsync_spark.streaming import IncrementalEngine, payloads_from_rows

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5
spark = get_spark("incbench")
cat = Catalog(spark, "/root/testdata/sf0.1")
eng = IncrementalEngine(spark, schemas.tree("orders_full"), cat)
t0 = time.perf_counter()
eng.full_sync()
print("full_sync %.2f" % (time.perf_counter() - t0), flush=True)
events = payloads_from_rows(spark, _incremental_events(spark, cat))
ts = []
for i in range(N):
    t0 = time.perf_counter()
    eng.process_batch(events)
    ts.append(time.perf_counter() - t0)
    print("batch%d %.2f" % (i, ts[-1]), flush=True)
print("median(batch1..) %.2f" % statistics.median(ts[1:]), flush=True)
