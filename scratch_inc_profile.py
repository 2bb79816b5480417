"""Scratch: phase-level timing of IncrementalEngine.process_batch.

Mirrors the current process_batch body with timing marks; keep in sync
with pgsync_spark/streaming/incremental.py when profiling.
"""
import sys
import time

from pyspark.sql import functions as F

from pgsync_spark import get_spark, Catalog, schemas
from pgsync_spark.operators.joins import maybe_broadcast
from pgsync_spark.plans.compiler import TreeCompiler
from pgsync_spark.queries import _incremental_events
from pgsync_spark.streaming import IncrementalEngine, payloads_from_rows
from pgsync_spark.streaming.incremental import materialize_tree
from pgsync_spark.streaming.cdc import INSERT, UPDATE, DELETE, TRUNCATE

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
    per_table = events.groupBy("table").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("txid").alias("mx"),
        F.sum(keep.cast("int")).alias("n_active"),
        F.sum((F.col("op").isin(INSERT, UPDATE) & keep).cast("int")).alias("n_new"),
        F.sum((F.col("op").isin(UPDATE, DELETE) & keep).cast("int")).alias("n_old"),
        F.max((F.col("op") == TRUNCATE).cast("int")).alias("has_trunc"),
    ).collect()
    mark("stats_agg")
    n_total = sum(r["n"] for r in per_table)
    n_active = sum(int(r["n_active"] or 0) for r in per_table)
    new_counts = {r["table"]: int(r["n_new"] or 0) for r in per_table}
    old_tables = {r["table"] for r in per_table if int(r["n_old"] or 0) > 0}
    any_trunc = any(r["has_trunc"] for r in per_table)
    eng.stats["batches"] += 1
    eng.stats["events"] += n_active
    mxs = [r["mx"] for r in per_table if r["mx"] is not None]
    if mxs:
        eng.checkpoint = max(eng.checkpoint or 0, max(mxs))
    active = events if n_total == n_active else events.filter(keep)
    batch_tmp = [events] if eng.materializer.compact_every == 1 else []

    ids = eng._resolve_old_images(
        active, n_active, has_truncate=any_trunc, old_tables=old_tables
    )
    mark("resolve_old_build")
    eng.materializer.apply(events, materialized=True)
    mark("materializer")
    new_keys = eng._resolve_new_images(active, new_counts)
    n_new = 0
    if new_keys is not None:
        new_keys = new_keys.localCheckpoint(eager=True)
        batch_tmp.append(new_keys)
        n_new = new_keys.count()
        mark("resolve_new_ckpt")
        key_ids = new_keys.select(
            F.concat_ws("|", *[F.col(c).cast("string") for c in eng.root_pks]).alias("_id")
        )
        ids = ids.unionByName(key_ids)

    ids = ids.localCheckpoint(eager=True)
    batch_tmp.append(ids)
    n_ids = ids.count()
    mark("ids_ckpt")

    affected = (
        eng.docs.join(maybe_broadcast(ids, known_rows=n_ids), "_id", "left_semi")
        .select("_id", *eng.root_pks)
        .localCheckpoint(eager=True)
    )
    batch_tmp.append(affected)
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
    batch_tmp.append(new_combined)
    mark("recompute_tree")
    eng.stats["recomputed_docs"] += new_docs.count()
    mark("recompute_count")
    eng.docs = eng.docs.join(
        maybe_broadcast(affected_ids, known_rows=n_affected), "_id", "left_anti"
    ).unionByName(new_docs)
    eng.lineage = eng.lineage.join(
        maybe_broadcast(affected_ids, known_rows=n_affected), "_id", "left_anti"
    ).unionByName(new_lineage)
    eng._pending_release.extend(batch_tmp)
    docs_ck = eng.docs.localCheckpoint(eager=True)
    mark("docs_compact")
    lin_ck = eng.lineage.localCheckpoint(eager=True)
    mark("lineage_compact")
    eng.docs, eng.lineage = docs_ck, lin_ck
    eng._release_superseded([docs_ck, lin_ck])

    prev = t_start
    parts = []
    for label, t in marks:
        parts.append(f"{label}={t - prev:.2f}")
        prev = t
    print(f"{tag} total={prev - t_start:.2f}  " + " ".join(parts), flush=True)


for i in range(N):
    timed_batch(eng, events0, f"batch{i}")
