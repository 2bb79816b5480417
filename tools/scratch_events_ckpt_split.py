"""Scratch: split the events_ckpt phase (process_batch's first serial
step) into sub-costs — Column-chain construction, the checkpoint job
itself, and the observation fetch — to see whether anything above the
one scheduler round-trip remains to cut (r14 VERDICT item 5)."""
import sys
import time

from pyspark.sql import Observation

from pgsync_spark import Catalog, get_spark, schemas, caching
from pgsync_spark.queries import _incremental_events
from pgsync_spark.streaming import IncrementalEngine, payloads_from_rows

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spark = get_spark("events-ckpt-split")
cat = Catalog(spark, SF)
eng = IncrementalEngine(spark, schemas.tree("orders_full"), cat)
eng.full_sync()

events0 = payloads_from_rows(
    spark, _incremental_events(spark, cat)
).localCheckpoint(eager=True)
print("events partitions:", events0.rdd.getNumPartitions())

for i in range(N):
    t0 = time.perf_counter()
    ev = events0.filter(eng._scope_cond)
    obs = Observation()
    chain = ev.coalesce(8).observe(obs, *eng._stat_metrics)
    t1 = time.perf_counter()
    ck = chain.localCheckpoint(eager=True)
    t2 = time.perf_counter()
    vals = obs.get
    t3 = time.perf_counter()
    tables = eng._stat_tables
    per_table = [
        {
            "table": t,
            "n": int(vals[f"n_{i2}"] or 0),
        }
        for i2, t in enumerate(tables)
    ]
    t4 = time.perf_counter()
    print(
        f"run {i}: construct={t1-t0:.4f} ckpt_job={t2-t1:.4f} "
        f"obs_get={t3-t2:.4f} per_table={t4-t3:.4f} "
        f"total={t4-t0:.4f}"
    )
    caching.release_local_checkpoint(ck)

# floor reference: an empty-plan job of the same task count
for label, mk in (
    ("range8.count", lambda: spark.range(8).coalesce(8).count()),
    ("events.count", lambda: events0.count()),
):
    t0 = time.perf_counter()
    mk()
    print(f"{label}: {time.perf_counter()-t0:.4f}")
eng._teardown_stores()
