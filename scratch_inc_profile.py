"""Scratch: phase-level timing of IncrementalEngine.process_batch."""
import sys
import time

from pyspark.sql import functions as F

from pgsync_spark import get_spark, Catalog, schemas
from pgsync_spark.operators.joins import maybe_broadcast
from pgsync_spark.plans.compiler import TreeCompiler
from pgsync_spark.queries import _incremental_events
from pgsync_spark.streaming import IncrementalEngine, payloads_from_rows
from pgsync_spark.streaming.incremental import materialize_tree
from pgsync_spark.streaming.cdc import TRUNCATE

N = int(sys.argv[1]) if len(sys.argv) > 1 else 3
spark = get_spark("incprof")
cat = Catalog(spark, "/root/testdata/sf0.1")
eng = IncrementalEngine(spark, schemas.tree("orders_full"), cat)
t0 = time.perf_counter()
eng.full_sync()
print("full_sync %.2f" % (time.perf_counter() - t0), flush=True)
events0 = payloads_from_rows(spark, _incremental_events(spark, cat))


def timed_batch(eng, events, tag):
    marks = []
    t_start = time.perf_counter()

    def mark(label):
        marks.append((label, time.perf_counter()))

    events = events.filter(eng._event_scope())
    events = events.localCheckpoint(eager=True)
    mark("events_ckpt")
    keep = eng._keep_event()
    agg = events.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("txid").alias("mx"),
        F.sum(keep.cast("int")).alias("n_active"),
        F.max((F.col("op") == TRUNCATE).cast("int")).alias("any_trunc"),
        F.max(
            ((F.col("op") == TRUNCATE) & (F.col("table") == eng.tree.root.table)).cast("int")
        ).alias("root_trunc"),
    ).collect()[0]
    mark("stats_agg")
    n_active = int(agg["n_active"] or 0)
    eng.stats["batches"] += 1
    eng.stats["events"] += n_active
    if agg["mx"] is not None:
        eng.checkpoint = max(eng.checkpoint or 0, agg["mx"])
    active = events if agg["n"] == n_active else events.filter(keep)

    ids = eng._resolve_old_images(active, n_active, has_truncate=bool(agg["any_trunc"]))
    mark("resolve_old_build")
    eng.materializer.apply(events, materialized=True)
    mark("materializer")
    new_keys = eng._resolve_new_images(active, n_active)
    n_new = 0
    if new_keys is not None:
        new_keys = new_keys.localCheckpoint(eager=True)
        n_new = new_keys.count()
        mark("resolve_new_ckpt")
        key_ids = new_keys.select(
            F.concat_ws("|", *[F.col(c).cast("string") for c in eng.root_pks]).alias("_id")
        )
        ids = ids.unionByName(key_ids)

    ids = ids.localCheckpoint(eager=True)
    n_ids = ids.count()
    mark("ids_ckpt")

    affected = (
        eng.docs.join(maybe_broadcast(ids, known_rows=n_ids), "_id", "left_semi")
        .select("_id", *eng.root_pks)
        .localCheckpoint(eager=True)
    )
    n_affected = affected.count()
    mark("affected_ckpt")
    affected_ids = affected.select("_id")
    affected_keys = affected.select(*eng.root_pks)
    if new_keys is not None:
        affected_keys = affected_keys.unionByName(new_keys)

    compiled = TreeCompiler(
        eng.catalog, root_keys=affected_keys, root_keys_rows=n_affected + n_new
    ).compile(eng.tree)
    new_docs, new_lineage, new_combined = materialize_tree(compiled)
    mark("recompute_tree")
    eng.stats["recomputed_docs"] += new_docs.count()
    eng.docs = eng.docs.join(
        maybe_broadcast(affected_ids, known_rows=n_affected), "_id", "left_anti"
    ).unionByName(new_docs)
    eng.lineage = eng.lineage.join(
        maybe_broadcast(affected_ids, known_rows=n_affected), "_id", "left_anti"
    ).unionByName(new_lineage)
    eng.docs = eng.docs.localCheckpoint(eager=True)
    mark("docs_compact")
    eng.lineage = eng.lineage.localCheckpoint(eager=True)
    mark("lineage_compact")

    prev = t_start
    parts = []
    for label, t in marks:
        parts.append(f"{label}={t - prev:.2f}")
        prev = t
    print(f"{tag} total={prev - t_start:.2f}  " + " ".join(parts), flush=True)


for i in range(N):
    timed_batch(eng, events0, f"batch{i}")
