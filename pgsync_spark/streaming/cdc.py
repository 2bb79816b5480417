"""CDC event model + snapshot materialization.

The event schema mirrors the reference's ``Payload``
(ref: pgsync/base.py:83-152, constants.py:61-72): op ∈ INSERT / UPDATE /
DELETE / TRUNCATE, old/new images as string→string maps (the reference
parses PostgreSQL test_decoding text into exactly this shape,
ref: pgsync/base.py:1115-1176 — we skip the text parsing and consume
structured events, as a Debezium-style source would deliver).

``TableMaterializer`` applies a batch of events to per-table snapshot
DataFrames (bronze-layer maintenance): UPDATE/DELETE match on the old
image's PK, INSERT/UPDATE append the new image. All DataFrame ops —
anti-join by key + union — the Delta-less MERGE equivalent; on a real
deployment this is a Delta/Iceberg MERGE INTO keyed on the PK.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import caching, exc
from ..catalog import Catalog
from ..operators.joins import maybe_broadcast

INSERT, UPDATE, DELETE, TRUNCATE = "INSERT", "UPDATE", "DELETE", "TRUNCATE"
TG_OPS = (INSERT, UPDATE, DELETE, TRUNCATE)

CDC_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("schema", T.StringType(), True),
        T.StructField("table", T.StringType(), False),
        T.StructField("old", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("new", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("txid", T.LongType(), True),
    ]
)


def payloads_from_rows(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Build a CDC DataFrame from plain dicts (tests / demo sequences).
    Values in old/new are stringified, as logical decoding delivers."""
    norm = []
    for r in rows:
        if r.get("op") not in TG_OPS:
            raise exc.InvalidTGOPError(f"op {r.get('op')!r} not in {TG_OPS}")
        norm.append(
            {
                "op": r["op"],
                "schema": r.get("schema", "public"),
                "table": r["table"],
                "old": {k: str(v) for k, v in (r.get("old") or {}).items()},
                "new": {k: str(v) for k, v in (r.get("new") or {}).items()},
                "txid": int(r.get("txid", 0)),
            }
        )
    return spark.createDataFrame(norm, CDC_SCHEMA)


# Debezium change-event envelope (public CDC standard emitted for BOTH
# PostgreSQL WAL and MySQL binlog sources — the engine's analog of the
# reference's two decoders, ref: pgsync/base.py:1115-1176 test_decoding
# parse and the MySQL binlog path). Scalar values coerce to strings in
# the map fields, matching logical decoding's stringly images.
DEBEZIUM_ENVELOPE = (
    "op string, before map<string,string>, after map<string,string>, "
    "source struct<table:string, db:string, schema:string, txId:string>, "
    "ts_ms long"
)


def debezium_to_cdc(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Map a raw Debezium JSON envelope column to CDC_SCHEMA rows.

    op: c/r → INSERT (r = snapshot read), u → UPDATE, d → DELETE,
    t → TRUNCATE. ``source.schema`` (PostgreSQL) falls back to
    ``source.db`` (MySQL). ``txId`` is used when numeric, else the
    event timestamp orders the stream (MySQL GTIDs are not integers).
    Rows with unknown ops are dropped. Pure column expressions — safe
    inside readStream without leaving whole-stage codegen.
    """
    e = F.from_json(F.col(value_col), DEBEZIUM_ENVELOPE)
    op = (
        F.when(e["op"].isin("c", "r"), F.lit(INSERT))
        .when(e["op"] == "u", F.lit(UPDATE))
        .when(e["op"] == "d", F.lit(DELETE))
        .when(e["op"] == "t", F.lit(TRUNCATE))
    )
    empty = F.expr("map()").cast("map<string,string>")
    return (
        df.select(
            op.alias("op"),
            F.coalesce(e["source"]["schema"], e["source"]["db"]).alias("schema"),
            e["source"]["table"].alias("table"),
            F.coalesce(e["before"], empty).alias("old"),
            F.coalesce(e["after"], empty).alias("new"),
            F.coalesce(
                e["source"]["txId"].try_cast("long"), e["ts_ms"]
            ).alias("txid"),
        )
        .filter(F.col("op").isNotNull())
    )


def _typed_image(
    events: DataFrame,
    image: str,
    snapshot: DataFrame,
    cols: list[str],
    extra: list | None = None,
) -> DataFrame:
    """Extract ``cols`` from the old/new map, cast to the snapshot's
    column types (logical-decoding images are strings,
    ref parse_value: pgsync/base.py:1089-1113). ``extra`` columns pass
    through untouched (event-order metadata for LWW folds)."""
    dtypes = dict(snapshot.dtypes)
    sel = []
    for c in cols:
        sel.append(F.col(image).getItem(c).cast(dtypes[c]).alias(c))
    return events.select(*sel, *(extra or []))


class TableMaterializer:
    """Keeps per-table snapshots current by applying CDC batches.

    Overlay design — per-batch cost is proportional to BATCH size, not
    table size. Each table keeps a fixed ``base`` (initially the raw
    parquet scan, so predicate pushdown and column pruning still reach
    the files) plus a small eagerly-checkpointed ``overlay``: one row
    per key changed since the last compaction, flagged ``__live`` (new
    image present) or tombstone (DELETEd). The registered snapshot view
    is::

        base ⟕anti overlay-keys  ∪  overlay[__live]

    Reads re-execute only a broadcast anti-join over the base scan —
    cheap and pipelined; the base is never rewritten per batch. Every
    ``compact_every`` applies the view folds into a new base checkpoint
    and the overlay resets (Delta/Iceberg analog: MERGE appends deletion
    vectors + new files per batch, OPTIMIZE compacts on a cadence).
    Superseded checkpoints release immediately — steady-state storage is
    one base + one bounded overlay per table. An earlier design
    rewrote the full merged snapshot per batch: correct, but a 600k-row
    lineitem rewrite for a 50-event batch is the wrong cost shape at
    scale.
    """

    OVERLAY_FLAG = "__live"
    # event-order metadata riding through the LWW fold; reserved names
    # so a synced table's own columns can never collide with them
    META_COLS = ("__cdc_txid", "__cdc_seq", "__cdc_sub")
    # overlays larger than this always trigger compaction regardless of
    # cadence (bounds the snapshot view's anti-join for big batches)
    OVERLAY_ROW_CAP = 65_536

    def __init__(self, catalog: Catalog, compact_every: int = 8):
        self.catalog = catalog
        self.compact_every = compact_every
        self._applies: dict[str, int] = {}
        self._base: dict[str, DataFrame] = {}
        self._overlay: dict[str, DataFrame] = {}
        # upper bound of overlay rows (accumulated event counts) — the
        # broadcast guard for the view's anti-join
        self._overlay_rows: dict[str, int] = {}
        # per-table prebuilt Column trees for the LWW fold (dead/live
        # projections, window spec) — they depend only on the table's
        # schema, which truncate (limit(0)) and compact (re-checkpoint)
        # both preserve, so they are built once per table instead of
        # per batch (guide §7.3 driver-side construction)
        self._fold_exprs: dict[str, tuple] = {}

    def _fold_exprs_for(self, table: str, base: DataFrame) -> tuple:
        """(pks, dead_cond, dead_sel, live_cond, live_sel, window) for
        ``table`` — the event→overlay fold expressions, cached. The
        dead/live selects fuse _typed_image's projection with the
        overlay-shape projection (one Project; same resolved tree)."""
        cached = self._fold_exprs.get(table)
        if cached is not None:
            return cached
        flag = self.OVERLAY_FLAG
        reserved = set(self.META_COLS) | {flag}
        if reserved & set(base.columns):
            raise exc.SchemaError(
                f"table {table!r} has columns colliding with CDC "
                f"metadata names {sorted(reserved & set(base.columns))}"
            )
        pks = list(self.catalog.primary_key(table))
        dtypes = dict(base.dtypes)
        meta = [F.col("txid").alias("__cdc_txid"), F.col("__cdc_seq")]
        dead_sel = [
            F.col("old").getItem(c).cast(dtypes[c]).alias(c)
            if c in pks
            else F.lit(None).cast(dtypes[c]).alias(c)
            for c in base.columns
        ] + [F.lit(False).alias(flag), *meta, F.lit(0).alias("__cdc_sub")]
        live_sel = [
            F.col("new").getItem(c).cast(dtypes[c]).alias(c)
            for c in base.columns
        ] + [F.lit(True).alias(flag), *meta, F.lit(1).alias("__cdc_sub")]
        w = Window.partitionBy(*pks).orderBy(
            *[F.col(c).desc() for c in self.META_COLS]
        )
        out = (
            pks,
            F.col("op").isin(UPDATE, DELETE),
            dead_sel,
            F.col("op").isin(INSERT, UPDATE),
            live_sel,
            w,
        )
        self._fold_exprs[table] = out
        return out

    def _snapshot_view(self, table: str, pks: list[str]) -> DataFrame:
        base = self._base[table]
        overlay = self._overlay.get(table)
        if overlay is None:
            return base
        keys = overlay.select(*pks)
        bound = self._overlay_rows.get(table)
        return base.join(
            maybe_broadcast(keys, known_rows=bound), on=pks, how="left_anti"
        ).unionByName(
            overlay.filter(F.col(self.OVERLAY_FLAG)).drop(self.OVERLAY_FLAG)
        )

    def release(self) -> None:
        """Free every checkpoint this materializer owns (bases that
        replaced the raw scans, all overlays) and restore the catalog's
        raw-source resolution for the touched tables. Engines that own
        their materializer call this from teardown — without it, a
        process cycling engines (a multi-section benchmark, a re-synced
        daemon) accumulates superseded snapshot blocks until GC pressure
        shows up as multi-second batch outliers (measured)."""
        for table, df in self._base.items():
            caching.release_local_checkpoint(df)  # no-op for raw scans
            self.catalog.unregister(table)
        for df in self._overlay.values():
            caching.release_local_checkpoint(df)
        self._base.clear()
        self._overlay.clear()
        self._overlay_rows.clear()
        self._applies.clear()

    def compact(self, table: str, defer_release: list | None = None) -> None:
        """Fold base+overlay into a fresh base checkpoint, release the
        superseded frames (OPTIMIZE analog).

        ``defer_release``: when the caller has OTHER jobs concurrently
        scanning the pre-compaction snapshot view (process_batch's
        resolve wave), superseded frames are appended there instead of
        released — localCheckpoint blocks have no lineage, so an
        unpersist racing an in-flight scan would lose blocks
        unrecoverably. The caller releases after its wave completes."""
        release = (
            defer_release.append
            if defer_release is not None
            else caching.release_local_checkpoint
        )
        pks = list(self.catalog.primary_key(table))
        new_base = self._snapshot_view(table, pks).localCheckpoint(eager=True)
        old_base = self._base.get(table)
        if old_base is not None:
            release(old_base)
        overlay = self._overlay.pop(table, None)
        if overlay is not None:
            release(overlay)
        self._base[table] = new_base
        self._overlay_rows[table] = 0
        self._applies[table] = 0
        self.catalog.register_df(table, new_base)

    def apply(
        self,
        events: DataFrame,
        materialized: bool = False,
        stats: list | None = None,
        seq_col: str | None = None,
        defer_release: list | None = None,
    ) -> None:
        """Apply one batch. Events are folded per table with
        LAST-WRITE-WINS semantics: each event contributes a *dead*
        action for its old-image PK (UPDATE/DELETE) and/or a *live*
        action carrying its new image (INSERT/UPDATE); the latest
        action per key — ordered by txid, then in-batch sequence —
        decides whether that key is a live overlay row or a tombstone.
        This matches the reference, which applies events in stream
        order (ref: pgsync/sync.py:1855-1888 run grouping), so
        INSERT→UPDATE→UPDATE on one key in a single micro-batch yields
        exactly the final image and UPDATE→DELETE yields a tombstone.
        TRUNCATE empties the table as of its stream position: events
        ordered AFTER the last TRUNCATE still apply (a batch of
        TRUNCATE→INSERT keeps the re-inserted rows, exactly as serial
        replay would).

        ``seq_col``: name of an explicit per-event sequence column
        (LSN / Kafka offset) when the source provides one — the
        authoritative same-txid order. Without it the fold falls back
        to ``monotonically_increasing_id`` over the checkpointed batch,
        which preserves arrival order WITHIN each source partition
        (partition id in the high bits); for multi-partition sources
        same-txid cross-partition order is partition order, not global
        arrival order — provide ``seq_col`` there.

        ``materialized``: the caller already eagerly checkpointed the
        events frame (process_batch does, once per batch) — skip the
        local one. ``stats``: per-table batch statistics (mappings with
        ``table`` / ``n`` / ``has_trunc``) when the caller already
        aggregated them (process_batch folds them into the events
        checkpoint via observe) — skips this method's own aggregation
        action. Per touched table the only job is the small overlay
        checkpoint, and all touched tables' checkpoints are submitted
        in ONE concurrent wave."""
        if not materialized:
            # decouple from micro-batch source files that vanish after
            # the epoch
            events = events.localCheckpoint(eager=True)
        seq = F.col(seq_col) if seq_col else F.monotonically_increasing_id()
        events = events.withColumn("__cdc_seq", seq.cast("long"))
        if stats is None:
            stats = events.groupBy("table").agg(
                F.count(F.lit(1)).alias("n"),
                F.max((F.col("op") == TRUNCATE).cast("int")).alias("has_trunc"),
            ).collect()
        # ``defer_release``: superseded checkpoint frames append here
        # instead of releasing immediately — required whenever the
        # caller runs apply() concurrently with other jobs that still
        # scan the PRE-batch snapshot views (see compact()'s docstring).
        release = (
            defer_release.append
            if defer_release is not None
            else caching.release_local_checkpoint
        )
        # phase 1 — build every touched table's merged overlay LAZILY
        pending: list[tuple[str, int, DataFrame, DataFrame | None]] = []
        for r in stats:
            table, n_ev, has_trunc = r["table"], r["n"], bool(r["has_trunc"])
            if n_ev == 0 and not has_trunc:
                continue
            snap = self.catalog.df(table)
            if table not in self._base:
                self._base[table] = snap
            pks, dead_cond, dead_sel, live_cond, live_sel, w = (
                self._fold_exprs_for(table, self._base[table])
            )
            ev = events.filter(F.col("table") == table)
            prev = self._overlay.get(table)
            if has_trunc:
                # TRUNCATE empties base + overlay as of its stream
                # position (ref: _truncate_op); only events ordered
                # after the LAST truncate survive into the LWW fold
                old_base = self._base[table]
                self._base[table] = snap.limit(0)
                release(old_base)
                if prev is not None:
                    release(prev)
                    self._overlay.pop(table)
                    prev = None
                self._overlay_rows[table] = 0
                cut = ev.filter(F.col("op") == TRUNCATE).select(
                    F.max(
                        F.struct(
                            F.coalesce(F.col("txid"), F.lit(0)).alias("t"),
                            F.col("__cdc_seq").alias("s"),
                        )
                    ).alias("__cut")
                )
                ev = ev.crossJoin(F.broadcast(cut)).filter(
                    F.struct(
                        F.coalesce(F.col("txid"), F.lit(0)).alias("t"),
                        F.col("__cdc_seq").alias("s"),
                    )
                    > F.col("__cut")
                ).drop("__cut")
            # key-action stream: dead(old pk) for UPDATE/DELETE, live(new
            # image) for INSERT/UPDATE. __cdc_sub breaks the tie inside
            # one UPDATE that keeps its key (the live image wins over
            # the removal of the same key by the same event). All
            # projection trees are prebuilt per table (_fold_exprs_for).
            dead = ev.filter(dead_cond).select(*dead_sel)
            live = ev.filter(live_cond).select(*live_sel)
            # one window shuffle over a batch-sized frame: last action
            # per key wins (LWW)
            delta = (
                dead.unionByName(live)
                .withColumn("__cdc_rn", F.row_number().over(w))
                .filter(F.col("__cdc_rn") == 1)
                .drop("__cdc_rn", *self.META_COLS)
            )
            # ≤ 2 distinct keys per event (old pk + new pk)
            if prev is not None:
                merged = prev.join(
                    maybe_broadcast(delta.select(*pks), known_rows=2 * n_ev),
                    on=pks,
                    how="left_anti",
                ).unionByName(delta)
            else:
                merged = delta
            pending.append((table, n_ev, merged, prev))
        if not pending:
            return
        # phase 2 — ONE concurrent checkpoint wave over all touched
        # tables (serial per-table round-trips dominated batch time)
        overlays = caching.local_checkpoint_parallel([m for _, _, m, _ in pending])
        compact_tables = []
        for (table, n_ev, _m, prev), overlay in zip(pending, overlays):
            if prev is not None:
                release(prev)
            self._overlay[table] = overlay
            # ≤ 2 overlay keys per event (old pk + new pk on a pk change)
            self._overlay_rows[table] = self._overlay_rows.get(table, 0) + 2 * n_ev
            self._applies[table] = self._applies.get(table, 0) + 1
            # compact on cadence OR when the overlay outgrows the batch —
            # a run of large batches must not grow the per-read anti-join
            # between cadence points (size analog of Delta's OPTIMIZE
            # trigger; keeps steady-state read cost O(batch), not O(run))
            if (
                self._applies[table] >= self.compact_every
                or self._overlay_rows[table] > max(8 * n_ev, self.OVERLAY_ROW_CAP)
            ):
                compact_tables.append(table)
            else:
                pks = list(self.catalog.primary_key(table))
                self.catalog.register_df(table, self._snapshot_view(table, pks))
        for table in compact_tables:
            self.compact(table, defer_release=defer_release)
