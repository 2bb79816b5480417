"""Persistent doc-store: parquet-backed state for the incremental engine.

The reference persists its checkpoint (txid / binlog pos) to a file or
Redis and the documents to the search index (ref: pgsync/sync.py:
1581-1656). Here the engine's state pieces — doc store, lineage
reverse index, checkpoint, and the CDC-modified bronze snapshots —
write to a versioned parquet layout:

    <path>/v<N>/docs/ , <path>/v<N>/lineage/ ,
    <path>/v<N>/tables/<table>/ , <path>/v<N>/state.json
    <path>/CURRENT  ← atomic pointer file naming the live version

A writer prepares v<N+1> completely, then swaps CURRENT (a one-line
file write — atomic on POSIX). Readers resolve CURRENT first, so a
crash mid-write never exposes a torn version. On a cluster the same
layout works on any object store; Delta/Iceberg would subsume this with
MERGE + time travel, but the engine semantics are identical.

Snapshot persistence matters because the reference's table state lives
in PostgreSQL and survives a restart for free; here the bronze layer is
DERIVED (base parquet + applied CDC), so without ``tables/`` a restart
would silently resume against pre-CDC table state and every subsequent
recompute would read stale rows. Only tables the materializer actually
touched are written — pristine tables keep resolving to the original
parquet with full pushdown.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from .. import caching


class DocStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _current(self) -> int | None:
        p = os.path.join(self.path, "CURRENT")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def save(self, engine) -> int:
        """Persist the engine's state as the next version and swap.

        Snapshots: every table the materializer has touched (has a base
        override or live overlay) writes its CURRENT merged view — the
        restored catalog then serves post-CDC rows. With a shared
        materializer (SyncRunner), call save on one engine per store
        path; the snapshot set is materializer-wide either way."""
        version = (self._current() or 0) + 1
        vdir = os.path.join(self.path, f"v{version}")
        engine.docs.write.mode("overwrite").parquet(os.path.join(vdir, "docs"))
        engine.lineage.write.mode("overwrite").parquet(
            os.path.join(vdir, "lineage")
        )
        mat = getattr(engine, "materializer", None)
        touched = sorted(set(mat._base) | set(mat._overlay)) if mat else []
        for table in touched:
            engine.catalog.df(table).write.mode("overwrite").parquet(
                os.path.join(vdir, "tables", table)
            )
        with open(os.path.join(vdir, "state.json"), "w") as f:
            json.dump(
                {
                    "checkpoint": engine.checkpoint,
                    "stats": engine.stats,
                    "tables": touched,
                },
                f,
            )
        tmp = os.path.join(self.path, "CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(self.path, "CURRENT"))
        return version

    def load(self, engine) -> bool:
        """Restore state into an engine; returns False if nothing saved.

        Persisted table snapshots re-register into the engine's catalog
        (and reset the materializer's bookkeeping for those tables), so
        recomputes and further batches run against post-CDC state even
        in a brand-new session/catalog."""
        version = self._current()
        if version is None:
            return False
        vdir = os.path.join(self.path, f"v{version}")
        engine.docs = self.spark.read.parquet(os.path.join(vdir, "docs"))
        engine.lineage = self.spark.read.parquet(os.path.join(vdir, "lineage"))
        with open(os.path.join(vdir, "state.json")) as f:
            state = json.load(f)
        engine.checkpoint = state.get("checkpoint")
        engine.stats = state.get("stats", engine.stats)
        mat = getattr(engine, "materializer", None)
        for table in state.get("tables", []):
            df = self.spark.read.parquet(os.path.join(vdir, "tables", table))
            engine.catalog.register_df(table, df)
            if mat is not None:
                # release the superseded in-memory state before replacing
                # it — restoring into a warm engine must not leak the old
                # base/overlay checkpoint blocks (compact() and the
                # truncate path release the same way)
                prev_base = mat._base.get(table)
                if prev_base is not None:
                    caching.release_local_checkpoint(prev_base)
                prev_overlay = mat._overlay.pop(table, None)
                if prev_overlay is not None:
                    caching.release_local_checkpoint(prev_overlay)
                mat._base[table] = df
                mat._overlay_rows[table] = 0
                mat._applies[table] = 0
        return True
