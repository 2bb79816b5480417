"""Incremental near-duplicate index: build the MinHash/LSH index ONCE,
probe each ingestion batch against it, append only the survivors.

This is the streaming-ingestion form of deduplication — the piece a
continuously-fed training corpus needs that one-shot self-dedup
(minhash_lsh_pairs) and one-shot cross-corpus filtering
(minhash_crosscorpus_pairs) don't give you: state. A fresh batch is
checked against everything accepted so far WITHOUT re-pairing the held
corpus against itself, duplicates are rejected, and the accepted docs'
slim band keys + shingle sets extend the index for the next batch.

Semantics (first-batch-wins): a new doc is dropped iff it verifies as
a near-duplicate (exact Jaccard >= JACCARD_THRESHOLD over hashed
3-gram shingles, candidates blocked by shared minhash band buckets
with the standard hot-bucket caps) of a SURVIVING doc from an earlier
batch. Within-batch duplicates are deliberately NOT dropped here —
batch self-dedup is a separate concern (dedup_canonical) that a
pipeline composes per-batch; keeping the two orthogonal makes both
testable and the oracle exact. A doc that was dropped never enters
the index, so a later doc resembling only the DROPPED copy (and not
its surviving representative) correctly survives — the oracle
reproduces exactly this recursion.

Scale design (the 100 TB story):
- The index holds two things: BANDS (doc_id, band, bucket — slim, the
  only thing the probe join touches) and SHINGLES (doc_id, sh — fat,
  touched only per candidate for the exact verify). Probe cost is
  O(batch bands + colliding index bands), never O(index²).
- The probe shuffle is keyed by (band, bucket). On a cluster the
  stored band frame is written partitioned on band (see
  _append; bucketBy(band, bucket) via saveAsTable where a
  metastore exists), so the held side is pre-clustered and only the
  batch side moves at probe time.
- The index only ever APPENDS (survivors of each batch), so on-disk
  maintenance is one small parquet append per batch — no rewrite of
  held state, the same O(batch)-not-O(table) property as the CDC
  overlay store. In memory the state is a LIST of per-batch persisted
  frames unioned lazily — extending the index never re-caches held
  batches.
- Hot buckets are capped on BOTH sides (MAX_BUCKET_WIDTH per side,
  same as the one-shot operators) so a boilerplate bucket can't go
  quadratic, with the same recall-through-other-bands behavior.

ref: the reference engine has no dedup machinery (this family is a
beyond-reference extension); the append-only state discipline mirrors
sinks/store.py.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import owned
from .dedup import (
    JACCARD_THRESHOLD,
    _band_frame,
    _crosscorpus_candidates,
    _signatures,
)
from .hashing import round6

_DECISION_SCHEMA = "doc_id bigint, dup_of bigint, jaccard double"

# CDC overlay auto-compaction cap (rows of op != 'a' state since the
# last compact): the overlay folds through BROADCAST anti/semi joins,
# so its size must stay bounded no matter how the operator tunes
# compact_every — the same rule as the relational engine's
# KeyedOverlay size cap (streaming/incremental.py, r3 item 10). 64k
# skinny (id, ver, op) rows is well inside every broadcast limit.
DEFAULT_OVERLAY_CAP = 65536

# apply_cdc op vocabulary: 'd' deletes; these (or NULL) upsert; 't'
# and anything else raise — an unrecognized op silently upserting a
# garbage row was the r8 verdict's parity-gap (a), and truncate is
# table-level, not per-doc (see _AppendOnlyIndex.truncate).
UPSERT_OPS = ("u", "c", "i", "r", "a")

# per-instance temp-view name prefixes for the one-SQL topk path
# (BM25Index/VectorIndex) — fresh per index so concurrent indexes in
# one session never collide
import itertools

_AIDX_VIEW_IDS = itertools.count()


def _fingerprint(sh):
    """md5 of the sorted hashed-shingle set: equal fingerprint <=>
    equal shingle SET (exact-duplicate content up to tokenization).
    Mirrored in the oracle as
    md5(list_aggregate(list_sort(sh), 'string_agg', ','))."""
    return F.md5(
        F.concat_ws(",", F.transform(F.array_sort(sh), lambda x: x.cast("string")))
    )


def _reset_ver(df: DataFrame | None) -> DataFrame | None:
    """ver -> the -1 sentinel (strictly older than every real epoch).
    Applied to every compact rewrite — see compact() for why stale
    epoch numbers on compacted rows are a rebind hazard."""
    if df is None or "ver" not in df.columns:
        return df
    return df.withColumn("ver", F.lit(-1).cast("long"))


def _with_cdc_cols(df: DataFrame, op: bool) -> DataFrame:
    """Normalize a segment written by the pre-CDC format (r7 and
    earlier: no ver/op columns) to the r8 versioned schema — ver=-1
    (never a real epoch) and op='a', exactly what those rows mean.
    A no-op for segments that already carry the columns."""
    if "ver" not in df.columns:
        df = df.withColumn("ver", F.lit(-1).cast("long"))
    if op and "op" not in df.columns:
        df = df.withColumn("op", F.lit("a"))
    return df


class _AppendOnlyIndex:
    """State discipline shared by the stateful dedup indexes: per-batch
    persisted frames in memory (held batches never re-cached; unioned
    lazily), append-only parquet on disk. Subclasses define the frame
    names and the probe.

    On-disk commits are ATOMIC per epoch (the sinks/store.py CURRENT
    discipline): each ingest writes its survivor keys/vals AND its
    drop decisions under ``<name>/epoch=N`` directories, then flips a
    ``CURRENT`` manifest (JSON: logical applied-epoch list + physical
    segment list, which ``compact`` collapses) via temp-file +
    os.replace.
    A crash mid-write leaves an unlisted epoch directory that ``load``
    never reads — so "the batch is in the index" and "the epoch is
    recorded as applied" are ONE atomic fact, and a stream replay can
    always tell exactly which side of the commit it is on
    (``epoch_applied`` + ``stored_decisions`` — see
    streaming/stream.py start_dedup_stream)."""

    _KEYS_NAME = "bands"  # slim (id, band, bucket) — the probe join
    _VALS_NAME = "vals"  # fat per-id payload — verify only
    _DEC_NAME = "decisions"
    _ID_COL = "doc_id"  # the per-row identity (EmbeddingIndex: vec_id)

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str | None = None,
        overlay_cap: int | None = DEFAULT_OVERLAY_CAP,
    ):
        self.spark = spark
        self.store_dir = store_dir
        # auto-compact when CDC overlay rows exceed this (None
        # disables — then compact_every is the operator's only dial
        # and a CDC burst between cadence points grows every query's
        # broadcast fold unboundedly; keep the default unless the
        # maintenance cadence is owned elsewhere)
        self.overlay_cap = overlay_cap
        self._key_parts: list[DataFrame] = []
        self._val_parts: list[DataFrame] = []
        self._epochs: set[int] = set()
        # physical data segments (directory names under keys/vals), in
        # ingest order — distinct from the LOGICAL applied-epoch set:
        # compaction rewrites segments but never changes which epochs
        # count as applied
        self._segments: list[str] = []
        # store-less only: (epoch, decisions) of the latest ingest,
        # kept for in-process batch-retry replay
        self._last_decisions: tuple[int, DataFrame] | None = None
        # the stream checkpoint this index's epoch bookkeeping is
        # paired with — epoch NUMBERS are meaningful only within one
        # checkpoint lineage (see bind_stream)
        self._stream_id: str | None = None
        # True once any apply_cdc epoch committed: gates the CDC
        # overlay fold so the append-only hot path never pays for it
        self._has_cdc = False
        # op != 'a' rows appended since the last compact — the size of
        # the state the overlay fold broadcasts. Maintained without
        # extra driver actions (_append already counts the epoch's val
        # rows); persisted in the manifest so a reloaded store keeps
        # the cap honest mid-cycle.
        self._overlay_rows = 0
        # set by apply_cdc before its commit: tells _append that this
        # epoch's val rows are ALL overlay rows, so the counter updates
        # before the manifest flip that persists it
        self._pending_overlay_delta = False
        # one-SQL topk support: session temp views over the lazily
        # unioned keys/vals parts, memoized on the parts LIST so an
        # unchanged store re-registers nothing (see _parts_view);
        # names are per-instance so concurrent indexes never collide
        self._view_prefix = f"__aidx{next(_AIDX_VIEW_IDS)}"
        self._topk_views: dict[str, tuple[tuple, str, list[str]]] = {}

    # -- occupancy-tracking hooks (no-ops here) -------------------------------
    #
    # VectorIndex maintains incremental per-(band, bucket) occupancy
    # counters for the rebuild policy (r12 verdict: the policy's
    # per-epoch full-keys scan was the engine's only O(corpus)-per-
    # batch streaming cost). The hooks fire at exactly the two moments
    # the counters' invariant needs, both BEFORE the manifest flip
    # that persists them (the _overlay_rows discipline — counter and
    # epoch travel as one atomic fact): each appended keys frame adds
    # O(batch), and every physical overlay fold (compact / truncate /
    # rebuild) re-derives them exactly from the folded frame the fold
    # already materialized.

    def _track_appended_keys(self, keys: DataFrame) -> None:
        """One epoch's about-to-commit keys frame (eagerly
        checkpointed, non-empty). Subclass hook; no-op here."""

    def _track_folded_keys(self, keys: DataFrame | None) -> None:
        """The physically-folded live keys frame after an overlay
        fold (None = no live keys remain). Subclass hook; no-op."""

    # -- epoch manifest ------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.store_dir, "CURRENT")

    def _manifest_extra(self) -> dict:
        """Subclass hook: extra keys persisted in the manifest (e.g.
        BM25Index's analyzer — index state is only interpretable by
        the configuration that wrote it)."""
        return {}

    def _load_manifest_extra(self, m: dict) -> None:
        """Subclass hook: restore `_manifest_extra` state at load."""

    def _commit_manifest(self) -> None:
        import json

        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "epochs": sorted(self._epochs),
                    "segments": self._segments,
                    "stream_id": self._stream_id,
                    "index": type(self).__name__,
                    "has_cdc": self._has_cdc,
                    "overlay_rows": self._overlay_rows,
                    **self._manifest_extra(),
                },
                f,
            )
        os.replace(tmp, self._manifest_path())

    # -- CDC overlay (versioned rows + tombstones, Lucene-style) -------------
    #
    # apply_cdc (BM25Index today; MinHash/Embedding via their probe
    # fold) appends NEW-VERSION rows (op='u', ver=epoch) and delete
    # tombstones (op='d') instead of rewriting held state. Readers
    # fold the overlay: rows of untouched ids pass a broadcast
    # anti-join; touched ids keep only rows matching their latest
    # version (a tombstone on top = dead). The overlay is sized by CDC
    # traffic since the last compact() — compact folds it physically
    # (shadowed versions and tombstones dropped, op reset to 'a') and
    # the overlay returns to zero. On disk the op != 'a' scan prunes
    # bulk segments at the parquet row-group level (op constant 'a').

    def _cdc_overlay(self, vals: DataFrame) -> DataFrame:
        """(id, ver, op) of each CDC-touched id's LATEST version —
        max-ver per id over the op != 'a' rows (ver is unique per id
        across epochs; within an epoch apply_cdc enforces one row per
        id)."""
        s = F.max(F.struct("ver", "op")).alias("s")
        return (
            vals.filter(F.col("op") != "a")
            .groupBy(self._ID_COL)
            .agg(s)
            .select(
                self._ID_COL,
                F.col("s.ver").alias("ver"),
                F.col("s.op").alias("op"),
            )
        )

    def _check_cdc_readd(self, batch_ids: DataFrame) -> None:
        """Bulk ``ingest()`` on an index with CDC history must not
        touch ids that history covers: the overlay folds only op!='a'
        rows, so an op='a' re-add of an updated/deleted id would be
        INVISIBLE to every reader (the id's overlay row still shadows
        it) and silently discarded by the next compact (r8 review
        finding). Raise instead — re-adds go through apply_cdc
        (op='u'), whose versioned rows participate in the fold."""
        if not self._has_cdc:
            return
        vals = self.vals
        if vals is None or "op" not in vals.columns:
            return
        hit = (
            self._cdc_overlay(vals)
            .join(F.broadcast(batch_ids.select(self._ID_COL)), self._ID_COL)
            .limit(1)
            .collect()
        )
        if hit:
            raise ValueError(
                f"ingest() batch contains {self._ID_COL} "
                f"{hit[0][self._ID_COL]}, which has CDC history "
                "(updated or deleted); re-add it via apply_cdc "
                "(op='u') — a bulk op='a' row would be shadowed by "
                "the overlay and dropped at the next compact"
            )

    def _validate_cdc_batch(
        self,
        cdc: DataFrame,
        bad_payload=None,
        payload_msg: str = "invalid payload",
    ) -> bool:
        """apply_cdc's entry contract in ONE driver action: per-id
        uniqueness (LWW-folded upstream), op vocabulary ('d' deletes,
        UPSERT_OPS or NULL upsert, anything else RAISES — an unknown
        op silently upserting a garbage row was the r8 verdict's
        parity gap; 't' gets a pointer to truncate()), and batch
        emptiness (the return value: True iff rows exist — an EMPTY
        micro-batch must never set _has_cdc and re-arm the overlay
        fold the last compact turned off, r8 advice).

        ``bad_payload`` (optional Column): a subclass's payload-shape
        predicate folded into the SAME action — rows matching it
        raise with ``payload_msg`` (r10: VectorIndex rejects NULL
        embeddings on upsert rows, which would otherwise index
        bucket-0 keys serving NULL cosines)."""
        idc = self._ID_COL
        bad = F.col("op").isNotNull() & ~F.col("op").isin(
            *UPSERT_OPS, "d", "t"
        )
        row = (
            cdc.groupBy(idc)
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.max(F.when(bad, F.col("op"))).alias("bad_op"),
                F.max((F.col("op") == "t").cast("int")).alias("trunc"),
                F.max(
                    (
                        bad_payload
                        if bad_payload is not None
                        else F.lit(False)
                    ).cast("int")
                ).alias("bad_pay"),
            )
            .agg(
                F.sum("c").alias("n"),
                F.max(F.when(F.col("c") > 1, F.col(idc))).alias(
                    "dup_id"
                ),
                # NULL ids raise below BEFORE the dup check, which
                # also covers the NULL-keyed duplicate group that
                # max(when(c>1, id)) alone would miss (review finding
                # — the r8 groupBy/collect check caught NULL keys)
                F.max(F.col(idc).isNull().cast("int")).alias("null_id"),
                F.max("bad_op").alias("bad_op"),
                F.max("trunc").alias("trunc"),
                F.max("bad_pay").alias("bad_pay"),
            )
            .first()
        )
        if row["null_id"]:
            raise ValueError(
                f"apply_cdc batch has a row with NULL {idc}: a "
                "versioned index has no identity to upsert or "
                "tombstone — fix the producer (or the id cast) "
                "upstream"
            )
        if row["dup_id"] is not None:
            raise ValueError(
                f"apply_cdc batch has multiple rows for {idc} "
                f"{row['dup_id']}; fold per-doc runs (LWW) before "
                "applying — order within a batch is the producer's "
                "knowledge, not the index's"
            )
        if row["trunc"]:
            raise ValueError(
                "op='t' (truncate) is a TABLE-level event, not a "
                "per-doc row — call index.truncate() to clear the "
                "held corpus as its own committed epoch"
            )
        if row["bad_op"] is not None:
            raise ValueError(
                f"unknown CDC op {row['bad_op']!r}: 'd' deletes, one "
                f"of {UPSERT_OPS} or NULL upserts — refusing to "
                "guess (an unrecognized op that silently upserted "
                "would index a garbage row)"
            )
        if row["bad_pay"]:
            raise ValueError(f"apply_cdc batch: {payload_msg}")
        return row["n"] is not None

    def _maybe_autocompact(
        self, decisions: DataFrame | None = None
    ) -> DataFrame | None:
        """compact() once overlay rows exceed ``overlay_cap`` — the
        index analog of the relational engine's KeyedOverlay size cap.
        The epoch-count cadence (a stream's compact_every) bounds the
        AVERAGE overlay, but a CDC burst between cadence points grows
        every query's broadcast fold unboundedly; the cap bounds the
        worst case. Called by apply_cdc after its epoch commits, so a
        crash between commit and compact replays as committed (the
        compact re-triggers at the next CDC epoch).

        ``decisions``: the epoch's about-to-be-returned decisions
        frame when its LINEAGE references the held parts (the dedup
        probes' frames do; BM25's dels derive from the batch only).
        compact's _swap_parts releases those parts' localCheckpoint
        blocks, after which a lost cached decisions partition is
        unrecoverable (review finding) — so when compaction actually
        fires, the frame is cut over to an eager localCheckpoint
        FIRST and the superseded cache released. Returns the frame to
        hand to the caller (unchanged when no compaction runs)."""
        if (
            self.overlay_cap is None
            or self._overlay_rows <= self.overlay_cap
        ):
            return decisions
        if decisions is not None:
            from .. import caching

            ck = decisions.localCheckpoint(eager=True)
            caching.release(decisions)  # the persisted original
            if (
                self._last_decisions is not None
                and self._last_decisions[1] is decisions
            ):
                # the store-less replay slot holds the SAME superseded
                # frame — cut it over too, or an in-process batch
                # retry after this compact would replay a frame whose
                # cache was just released and whose lineage bottoms
                # out in freed blocks (review pass 2 finding)
                self._last_decisions = (self._last_decisions[0], ck)
            # the checkpointed frame owns no caches; its small blocks
            # are the ContextCleaner's (the bm25 query convention)
            decisions = ck
        self.compact()
        return decisions

    def truncate(self, epoch: int | None = None) -> DataFrame:
        """Clear the WHOLE held corpus as one committed epoch — the
        index-level analog of a relational TRUNCATE event (the
        relational engine maps op='t' to table truncation,
        streaming/cdc.py:314, ref: pgsync/sync.py:1295-1343 truncate
        slices; the index-CDC path previously had no way to be told
        "the corpus was cleared" short of deleting every id — r8
        verdict parity gap (a)).

        Returns decisions = every id live at the instant of the
        truncate (NULL metric columns: removed, but not as anyone's
        duplicate), so a stream front-end's accepted/decisions split
        and the stored_decisions replay path treat truncation like
        any other epoch. Cutover is atomic: decisions committed
        first, then ONE manifest flip to the empty segment list (a
        crash in between leaves the old corpus fully live and the
        epoch unapplied); old segment dirs are deleted after the flip
        and are never read if deletion is interrupted. All CDC
        overlay state dies with the corpus — the next epoch starts on
        the append-only fast path."""
        import shutil

        if epoch is None:
            epoch = self.next_epoch()
        self._check_epoch(epoch)
        vals = self.vals
        if vals is None:
            live = self.spark.createDataFrame([], f"{self._ID_COL} bigint")
        else:
            if self._has_cdc and "op" in vals.columns:
                vals = self._cdc_live(vals, self._cdc_overlay(vals))
            live = vals.select(self._ID_COL).distinct()
        # eager checkpoint BEFORE the parts it derives from are
        # released below (the lineage-truncation discipline _append
        # documents); the small block is the ContextCleaner's
        decisions = self._delete_decisions(live).localCheckpoint(eager=True)
        if self.store_dir is not None:
            decisions.write.mode("overwrite").parquet(
                os.path.join(self.store_dir, self._DEC_NAME, f"epoch={epoch}")
            )
        else:
            self._last_decisions = (epoch, decisions)
        old_segments, self._segments = self._segments, []
        self._epochs.add(epoch)
        self._has_cdc = False
        self._overlay_rows = 0
        self._pending_overlay_delta = False
        self._track_folded_keys(None)  # empty corpus: counters reset
        if self.store_dir is not None:
            self._commit_manifest()
            for s in old_segments:
                for name in (self._KEYS_NAME, self._VALS_NAME):
                    shutil.rmtree(
                        os.path.join(self.store_dir, name, s),
                        ignore_errors=True,
                    )
        self._swap_parts(None, None)
        return decisions

    def _cdc_live(
        self,
        frame: DataFrame,
        overlay: DataFrame,
        extra_dead: DataFrame | None = None,
    ) -> DataFrame:
        """Fold ``frame`` (any keys/vals frame carrying (_ID_COL, ver))
        to current-version rows: untouched ids pass the anti-join,
        touched ids keep only their latest live version's rows.
        ``extra_dead`` (single id column): ids treated dead regardless
        — an apply_cdc probe passes its own batch's ids so an update
        never matches its own superseded version.

        The broadcast hints are SAFE by construction: the overlay is
        bounded by ``overlay_cap`` + one batch (_maybe_autocompact
        compacts past the cap even if the stream's compact_every
        cadence never fires), so the dead/alive frames stay far under
        any broadcast/driver-memory limit."""
        idc = self._ID_COL
        dead = overlay.select(idc)
        alive = overlay.filter(F.col("op") != "d").select(idc, "ver")
        if extra_dead is not None:
            dead = dead.unionByName(extra_dead.select(idc)).distinct()
            alive = alive.join(
                F.broadcast(extra_dead.select(idc)), idc, "left_anti"
            )
        clean = frame.join(F.broadcast(dead), idc, "left_anti")
        current = frame.join(F.broadcast(alive), [idc, "ver"], "left_semi")
        return clean.unionByName(current)

    def bind_stream(self, stream_id: str, allow_rebind: bool = False) -> None:
        """Pair the index's REPLAY bookkeeping with one stream
        checkpoint. Spark's epoch_id restarts from 0 for every new
        checkpoint directory, so "epoch 3 is applied" is only true
        relative to the checkpoint that numbered it — honoring it for
        a different checkpoint would skip probing brand-new data and
        replay stale decisions (silent corpus corruption). A mismatch
        therefore RAISES unless ``allow_rebind``: rebinding keeps the
        held corpus (compacted into a fresh segment so old epoch=N
        directory names are free for the new stream) but resets the
        applied-epoch set and deletes stored decisions — the new
        stream starts probing from its own epoch 0."""
        import shutil

        if self._stream_id == stream_id:
            return
        if self._stream_id is None and not self._epochs:
            # clean first bind: no epoch bookkeeping exists that a new
            # checkpoint could mis-read
            self._stream_id = stream_id
            if self.store_dir is not None and os.path.exists(
                self._manifest_path()
            ):
                self._commit_manifest()
            return
        # Either the store is paired with a DIFFERENT checkpoint, or it
        # is unbound but carries applied epochs (built via direct
        # ingest() calls, or a binding that never committed). Both mean
        # the same thing: epochs 0..N in the manifest were NOT numbered
        # by this checkpoint, so honoring them would make
        # epoch_applied() skip probing brand-new batches and
        # stored_decisions() replay stale decisions over them — silent
        # corpus corruption. Raise unless the caller opts into the
        # compact+reset rebind.
        if not allow_rebind:
            whose = (
                f"paired with stream checkpoint {self._stream_id!r}"
                if self._stream_id is not None
                else "carrying applied epochs from direct ingest() "
                "calls (no stream checkpoint numbered them)"
            )
            raise ValueError(
                f"index store is {whose} but this stream uses "
                f"{stream_id!r}; epoch replay bookkeeping does not "
                "transfer between checkpoints — reuse the original "
                "checkpoint dir, or pass rebind=True to keep the held "
                "corpus and restart epoch bookkeeping"
            )
        self.compact(force=True)
        self._epochs = set()
        self._last_decisions = None
        self._stream_id = stream_id
        if self.store_dir is not None:
            shutil.rmtree(
                os.path.join(self.store_dir, self._DEC_NAME),
                ignore_errors=True,
            )
            self._commit_manifest()

    def epoch_applied(self, epoch: int) -> bool:
        """True iff ``epoch``'s ingest is committed index state."""
        return epoch in self._epochs

    def _check_epoch(self, epoch: int) -> None:
        """Re-committing an applied epoch would append a duplicate
        segment (held docs doubled after reload) — the replay path is
        stored_decisions, never a second ingest. Checked at ingest
        ENTRY (before any Spark work) and again at commit."""
        if epoch in self._epochs:
            raise ValueError(
                f"epoch {epoch} is already applied index state; "
                "replay via stored_decisions, not a re-ingest"
            )

    def next_epoch(self) -> int:
        return max(self._epochs) + 1 if self._epochs else 0

    def stored_decisions(self, epoch: int) -> DataFrame | None:
        """The drop decisions an applied epoch committed — what a
        stream replay needs to rebuild that epoch's outputs without
        re-probing (the batch is already IN the index, so a re-probe
        would be wrong). Store-less indexes answer only for the latest
        epoch (retained in memory — the in-process batch-retry case,
        the only replay a store-less index can survive anyway)."""
        if self.store_dir is None:
            if self._last_decisions and self._last_decisions[0] == epoch:
                return self._last_decisions[1]
            return None
        path = os.path.join(self.store_dir, self._DEC_NAME, f"epoch={epoch}")
        if not os.path.isdir(path):
            return None
        return self.spark.read.parquet(path)

    @classmethod
    def load(cls, spark: SparkSession, store_dir: str):
        import json

        idx = cls(spark, store_dir)
        manifest = os.path.join(store_dir, "CURRENT")
        if not os.path.exists(manifest) and (
            os.path.isdir(os.path.join(store_dir, cls._KEYS_NAME))
            # vals-only stores are legitimate since the per-side
            # gating (BM25 stats-only segments) — a torn copy that
            # kept only docstats must refuse too, not load empty
            or os.path.isdir(os.path.join(store_dir, cls._VALS_NAME))
        ):
            # data dirs without a manifest = a store written by the
            # pre-manifest append-mode format (or a torn copy).
            # Loading it as empty would silently forget the whole held
            # corpus and re-accept every duplicate — refuse instead.
            raise ValueError(
                f"{store_dir} has index data but no CURRENT manifest "
                "(pre-manifest format or torn copy) — re-ingest the "
                "corpus into a fresh store"
            )
        if os.path.exists(manifest):
            with open(manifest) as f:
                m = json.load(f)
            written_by = m.get("index", cls.__name__)
            if written_by != cls.__name__:
                # both index classes share the keys layout, so a
                # mismatched load would otherwise die deep in Spark on
                # a missing vals path with no hint of the real cause
                raise ValueError(
                    f"{store_dir} was written by {written_by}, not "
                    f"{cls.__name__} — load it with the matching index "
                    "class (CLI: --dedup-index)"
                )
            idx._epochs = set(m["epochs"])
            idx._stream_id = m.get("stream_id")
            idx._has_cdc = m.get("has_cdc", False)
            idx._load_manifest_extra(m)
            idx._overlay_rows = m.get("overlay_rows", -1)  # -1: pre-r9
            # read committed segment dirs individually: an uncommitted
            # (crashed mid-write) directory is never touched, not even
            # for schema inference. An epoch whose batch was dropped
            # entirely committed no survivor files (empty partitioned
            # writes produce none) — it has no segment, the epoch
            # still counts as applied via the manifest. Pre-segment
            # manifests (no "segments" key) fall back to one segment
            # per applied epoch.
            idx._segments = m.get(
                "segments", [f"epoch={e}" for e in sorted(idx._epochs)]
            )
            for seg in idx._segments:
                # each side independently (a segment may hold only one:
                # BM25 batches of stats-only docs write vals, no keys)
                kp = os.path.join(store_dir, cls._KEYS_NAME, seg)
                if os.path.isdir(kp):
                    idx._key_parts.append(
                        _with_cdc_cols(
                            spark.read.parquet(kp), op=False
                        ).persist()
                    )
                vp = os.path.join(store_dir, cls._VALS_NAME, seg)
                if os.path.isdir(vp):
                    idx._val_parts.append(
                        _with_cdc_cols(
                            spark.read.parquet(vp), op=True
                        ).persist()
                    )
            if idx._overlay_rows < 0:
                # manifest written before the counter existed: one
                # load-time count re-seeds it (the op != 'a' scan
                # prunes bulk segments at row-group stats), only
                # needed when CDC state is actually held
                vals = idx.vals
                idx._overlay_rows = (
                    vals.filter(F.col("op") != "a").count()
                    if idx._has_cdc
                    and vals is not None
                    and "op" in vals.columns
                    else 0
                )
        return idx

    @property
    def keys(self) -> DataFrame | None:
        if not self._key_parts:
            return None
        return reduce(DataFrame.unionByName, self._key_parts)

    @property
    def vals(self) -> DataFrame | None:
        if not self._val_parts:
            return None
        return reduce(DataFrame.unionByName, self._val_parts)

    def _append(
        self,
        keys: DataFrame,
        vals: DataFrame,
        decisions: DataFrame,
        epoch: int,
    ) -> None:
        """Checkpoint + materialize the survivor frames FIRST (so the
        caller can release the batch intermediates they derive from),
        then commit the on-disk epoch from the now-cached frames.
        Store writes before the checkpoint would execute the band
        explode and the survivor anti-join a second time per batch.

        localCheckpoint, NOT persist: each survivor frame's lineage
        embeds the probe against the union of every earlier part, so
        a persist (which caches data but keeps the logical plan) makes
        part k's plan O(2^k) — measured as 3.7→6→16→64s/batch blowup
        by batch 5 on 10-doc batches, pure Catalyst analysis time.
        The eager checkpoint truncates each part to a leaf; probe
        plans then grow linearly in the part count (and compact()
        resets even that)."""
        self._check_epoch(epoch)
        from pyspark.sql import Observation

        from .. import caching

        # ONE concurrent wave for the two independent survivor
        # frames (caching.local_checkpoint_parallel — the engine's
        # apply_overlays_parallel discipline): both usually derive
        # from the same persisted batch frame, whose blocks are
        # computed once under the BlockManager's per-block locks, so
        # the second job reads the cache instead of redoing the
        # tokenize/band work. Serially each eager checkpoint was a
        # full driver→scheduler round-trip per epoch. The row counts
        # each side's emptiness gate needs ride the checkpoint jobs
        # themselves as Observations (the engine's process_batch
        # discipline) — formerly two more driver round-trips per epoch.
        obs_k, obs_v = Observation(), Observation()
        keys, vals = caching.local_checkpoint_parallel(
            [
                keys.observe(obs_k, F.count(F.lit(1)).alias("n")),
                vals.observe(obs_v, F.count(F.lit(1)).alias("n")),
            ]
        )
        n_keys = int(obs_k.get["n"] or 0)
        n_vals = int(obs_v.get["n"] or 0)

        # each side gates on ITS OWN emptiness (r7 review): the dedup
        # indexes keep keys/vals pairwise empty-or-not (no survivors →
        # both empty), but BM25Index appends docstats for batches whose
        # postings are empty — all-zero-token docs still count toward
        # N/avgdl, and gating vals on n_keys silently dropped those doc
        # stats (breaking the additivity oracle after such a batch).
        # An empty side is still released: appending it would deepen
        # every later union's plan and diverge from load(), which
        # skips segment-less sides.
        if n_keys:
            self._key_parts.append(keys)
            # occupancy counters fold this epoch in BEFORE the
            # manifest flip below persists them (one O(batch) agg
            # over the just-checkpointed frame, only when tracking)
            self._track_appended_keys(keys)
        else:
            caching.release_local_checkpoint(keys)
        if n_vals:
            self._val_parts.append(vals)
        else:
            caching.release_local_checkpoint(vals)
        if self.store_dir is None:
            # in-process replay support for store-less indexes: retain
            # the latest epoch's decisions so a failed-then-retried
            # foreachBatch can rebuild its outputs (see stored_decisions)
            self._last_decisions = (epoch, decisions)
        if self.store_dir is not None:
            # per-epoch dirs, mode=overwrite: a half-written dir from a
            # crashed attempt is simply rewritten; held epochs' files
            # are never touched (append-only maintenance). keys are
            # partitioned by band so a per-band probe prunes
            # directories. An all-dropped batch writes no survivor
            # dirs at all (a partitioned write of an empty frame
            # produces no readable files) — the manifest alone records
            # the epoch. The epoch becomes visible ONLY at the
            # manifest flip below.
            if n_keys:
                keys.write.mode("overwrite").partitionBy("band").parquet(
                    os.path.join(
                        self.store_dir, self._KEYS_NAME, f"epoch={epoch}"
                    )
                )
            if n_vals:
                vals.write.mode("overwrite").parquet(
                    os.path.join(
                        self.store_dir, self._VALS_NAME, f"epoch={epoch}"
                    )
                )
            decisions.write.mode("overwrite").parquet(
                os.path.join(self.store_dir, self._DEC_NAME, f"epoch={epoch}")
            )
            if n_keys or n_vals:
                self._segments.append(f"epoch={epoch}")
        if self._pending_overlay_delta:
            # a CDC epoch's val rows are ALL overlay rows (op='u'
            # survivors + 'd' tombstones): fold the count in BEFORE
            # the manifest flip below persists it, using the n_vals
            # this method already counted — zero extra driver actions
            self._overlay_rows += n_vals
            self._pending_overlay_delta = False
        self._epochs.add(epoch)
        if self.store_dir is not None:
            self._commit_manifest()

    def compact(self, force: bool = False) -> None:
        """Collapse all held segments into ONE — the at-scale
        maintenance op for a long-running stream. Two growth problems
        it bounds: on disk, one directory per epoch degrades every
        ``load``/scan into a small-files walk (1000 epochs → 1000
        footer reads per probe); in memory, the lazy union deepens by
        one frame per batch, growing every probe's plan linearly.

        Cutover is atomic (the same CURRENT discipline as ingest):
        write the combined segment as an UNLISTED ghost dir, persist
        the read-back, flip the manifest to the single new segment,
        then delete the old segment dirs (a crash between flip and
        delete leaves orphans that are never read). The applied-epoch
        set and the per-epoch decision dirs are untouched —
        ``epoch_applied`` / ``stored_decisions`` answer identically
        after compaction, so stream replay semantics survive.

        With CDC state held (``_has_cdc``), compaction is also the
        Lucene merge: the overlay folds physically FIRST — shadowed
        versions and tombstoned ids drop from both frames, survivors
        reset to op='a' — then the folded single frames cut over. The
        fold materializes via eager localCheckpoint BEFORE
        _swap_parts releases the old parts' blocks (a lazy fold over
        released localCheckpoints has nothing to recompute from), and
        dirty rows only exist in epoch=N segments appended since the
        last compact, so force=True always reaches the needs_rename
        rewrite and disk can never diverge from the folded memory."""
        import shutil

        if not self._key_parts and not self._val_parts:
            return
        stale_flag_cleared = False
        if self._has_cdc:
            from .. import caching

            vals = self.vals
            had_dirty = (
                vals is not None
                and "op" in vals.columns
                and not vals.filter(F.col("op") != "a").isEmpty()
            )
            if not had_dirty:
                # the flag is stale (set, but zero dirty rows held —
                # e.g. every CDC epoch since the last compact carried
                # only rows that dropped): the reset below must reach
                # the MANIFEST too, or a reloaded store pays the
                # overlay scan + two joins per query forever (r8
                # advice) — the early return skips the rewrite that
                # would otherwise commit it
                stale_flag_cleared = self.store_dir is not None
            if had_dirty:
                overlay = self._cdc_overlay(vals)
                fv = (
                    self._cdc_live(vals, overlay)
                    .withColumn("op", F.lit("a"))
                    .localCheckpoint(eager=True)
                )
                fk = None
                keys = self.keys
                if keys is not None:
                    fk = self._cdc_live(keys, overlay).localCheckpoint(
                        eager=True
                    )
                    if fk.count() == 0:
                        # a partitioned write of an empty frame leaves
                        # an unreadable dir — drop the side (_append
                        # gates the same way)
                        caching.release_local_checkpoint(fk)
                        fk = None
                # vals stays even when empty: the non-partitioned write
                # round-trips an empty frame with schema, and an
                # all-deleted corpus must still flip the manifest off
                # the old segments
                self._swap_parts(fk, fv)
                # the fold already materialized the exact live keys —
                # reconcile the occupancy counters from it (gross
                # append-counting drifts by at most the overlay being
                # folded away here), before any commit below persists
                # them
                self._track_folded_keys(fk)
                force = True
            # the overlay is now provably empty either way (folded
            # above, or there were no dirty rows at all): drop the
            # flag so readers/probes return to the append-only fast
            # path — leaving it set costs an overlay scan + two joins
            # per query FOREVER (r8 review finding). The reset reaches
            # the manifest via this compact's cutover commit, or via
            # the stale_flag_cleared commit at the early return.
            self._has_cdc = False
            self._overlay_rows = 0
        # force (the bind_stream rebind path) must still rewrite even a
        # SINGLE epoch=N segment: the rebound stream reuses epoch
        # numbers, and its epoch=N write would clobber a dir the
        # manifest still lists
        needs_rename = force and (
            # store-backed: epoch=N dirs must vacate for a rebound
            # stream's reused epoch numbers
            (
                self.store_dir is not None
                and any(s.startswith("epoch=") for s in self._segments)
            )
            # store-less: a forced (rebind) compact must still rewrite
            # a single held part — its rows can carry real epoch vers
            # that a rebound stream's reused epoch numbers would
            # collide with (the _reset_ver hazard below)
            or (self.store_dir is None and bool(self._val_parts))
        )
        if (
            len(self._key_parts) <= 1
            and len(self._val_parts) <= 1
            and not needs_rename
        ):
            if stale_flag_cleared:
                self._commit_manifest()
            return
        # either side may be None (one-sided segments: BM25 batches of
        # stats-only docs hold vals, no keys)
        keys, vals = self.keys, self.vals
        # every compact rewrite resets ver to the -1 sentinel (the
        # same value the pre-CDC load shim uses): compacted rows are
        # all live and versionless, and a REBOUND stream reuses epoch
        # numbers — keeping old vers would let a rebound apply_cdc's
        # (id, ver=N) overlay row semi-join-match a compacted survivor
        # that happened to be written at the old epoch N, resurrecting
        # and duplicating the stale version (r8 review pass 2,
        # confirmed live). -1 is strictly older than every real epoch,
        # so the max-ver fold always prefers genuine CDC rows.
        keys = _reset_ver(keys)
        vals = _reset_ver(vals)
        if self.store_dir is not None:
            seg = f"compacted-{self.next_epoch()}"
            n = 0
            while seg in self._segments or os.path.isdir(
                os.path.join(self.store_dir, self._KEYS_NAME, seg)
            ):
                # never write into a LISTED segment (a rebound stream's
                # epoch counter can revisit old numbers); ghost dirs
                # from crashed compacts are skipped too, harmlessly
                n += 1
                seg = f"compacted-{self.next_epoch()}-{n}"
            new_keys = new_vals = None
            if keys is not None:
                keys.write.mode("overwrite").partitionBy("band").parquet(
                    os.path.join(self.store_dir, self._KEYS_NAME, seg)
                )
                new_keys = self.spark.read.parquet(
                    os.path.join(self.store_dir, self._KEYS_NAME, seg)
                ).persist()
                new_keys.count()
            if vals is not None:
                vals.write.mode("overwrite").parquet(
                    os.path.join(self.store_dir, self._VALS_NAME, seg)
                )
                new_vals = self.spark.read.parquet(
                    os.path.join(self.store_dir, self._VALS_NAME, seg)
                ).persist()
                new_vals.count()
            old_segments, self._segments = self._segments, [seg]
            self._commit_manifest()
            self._swap_parts(new_keys, new_vals)
            for s in old_segments:
                for name in (self._KEYS_NAME, self._VALS_NAME):
                    shutil.rmtree(
                        os.path.join(self.store_dir, name, s),
                        ignore_errors=True,
                    )
        else:
            # eager checkpoint (not persist): the union's lineage spans
            # every old part — truncate it so the compacted frame is a
            # leaf and old parts' blocks can actually be freed
            from .. import caching

            if keys is not None and vals is not None:
                new_keys, new_vals = caching.local_checkpoint_parallel(
                    [keys, vals]
                )
            else:
                new_keys = (
                    keys.localCheckpoint(eager=True)
                    if keys is not None
                    else None
                )
                new_vals = (
                    vals.localCheckpoint(eager=True)
                    if vals is not None
                    else None
                )
            self._swap_parts(new_keys, new_vals)

    def _swap_parts(
        self, new_keys: DataFrame | None, new_vals: DataFrame | None
    ) -> None:
        from .. import caching

        for f in self._key_parts + self._val_parts:
            if not caching.release_local_checkpoint(f):
                f.unpersist()
        self._key_parts = [new_keys] if new_keys is not None else []
        self._val_parts = [new_vals] if new_vals is not None else []

    # -- one-SQL topk plumbing (BM25Index / VectorIndex serving path) --------
    #
    # The Column-API topk constructions were the single largest
    # remaining driver cost of the serving paths: every DataFrame op
    # is an eager py4j round-trip plus a JVM analysis sweep (568
    # round-trips per VectorIndex.topk, 819 per BM25Index.topk,
    # cProfiled on this host — guide §7.3). The one-SQL form builds
    # the whole query as TEXT (zero round-trips) over session temp
    # views of the parts unions and submits ONE spark.sql. Parity with
    # the Column twin (_topk_df, kept as the reference and the IVF
    # subclass path) is pinned by tests/test_topk_sql_parity.py:
    # optimized-plan sameResult + byte-equal rows, CDC and no-CDC.
    #
    # Text discipline (learned against sameResult): NO CTEs — a CTE
    # referenced twice is inlined with alias-Project wrappers that
    # survive canonicalization, while the Column path's reused plan
    # objects deduplicate leaf ids with no extra node. Shared
    # subtrees are expanded textually instead, exactly like the lazy
    # Column plans duplicate them.

    def _global_temp_db(self) -> str:
        try:
            return self.spark.conf.get(
                "spark.sql.globalTempDatabase", "global_temp"
            )
        except Exception:  # noqa: BLE001
            return "global_temp"

    def _register_view(self, df: DataFrame, name: str) -> str:
        """Register ``df`` as a GLOBAL temp view and return the
        qualified name to reference in SQL text. Global, not session:
        in foreachBatch the parts frames are bound to the stream's
        CLONED SparkSession, whose session-temp-view catalog is
        isolated from ``self.spark`` — a session view registered
        there is invisible to the index's own spark.sql (found by
        test_cdc_through_the_streaming_pipeline). The global-temp
        catalog is application-shared, so every session sees it."""
        df.createOrReplaceGlobalTempView(name)
        return f"{self._global_temp_db()}.{name}"

    def _parts_view(self, side: str) -> tuple[str, list[str]]:
        """Register (memoized) the lazily-unioned keys/vals frame as a
        global temp view; returns (qualified_name, columns).
        Re-registers only when the parts list changed (append/compact/
        truncate) — an unchanged store costs zero py4j calls here."""
        parts = tuple(
            self._key_parts if side == "keys" else self._val_parts
        )
        name = f"{self._view_prefix}_{side}"
        cur = self._topk_views.get(side)
        if (
            cur is not None
            and len(cur[0]) == len(parts)
            and all(a is b for a, b in zip(cur[0], parts))
        ):
            return cur[1], cur[2]
        df = reduce(DataFrame.unionByName, parts)
        qname = self._register_view(df, name)
        cols = df.columns
        # the memoized tuple holds strong refs, so `is` identity above
        # can never alias a released-and-reallocated frame
        self._topk_views[side] = (parts, qname, cols)
        return qname, cols

    def _drop_topk_views(self) -> None:
        names = [n for (_p, n, _c) in self._topk_views.values()]
        names.extend(self._extra_view_names())
        for qname in names:
            try:
                self.spark.catalog.dropGlobalTempView(
                    qname.rsplit(".", 1)[-1]
                )
            except Exception:  # noqa: BLE001 — teardown best-effort
                pass
        self._topk_views.clear()

    def _extra_view_names(self) -> list[str]:
        """Subclass hook: extra per-instance temp views to drop."""
        return []

    def _cdc_live_sql(self, frame_sub: str, cols: list[str]) -> str:
        """``_cdc_live(frame, _cdc_overlay(vals))`` as Spark SQL text
        (same tree — the parity tests pin it). ``frame_sub`` is a
        parenthesized subquery or view name; ``cols`` its columns.
        Column order mirrors the Column path exactly: the keyed
        semi/anti joins put the join key first and unionByName
        realigns the semi branch to the anti branch's order."""
        idc = self._ID_COL
        vview, _vcols = self._parts_view("vals")
        ordered = [idc] + [c for c in cols if c != idc]
        fcols = ", ".join(f"f.{c}" for c in ordered)
        ovl = (
            f"SELECT {idc}, s.ver AS ver, s.op AS op FROM ("
            f"SELECT {idc}, max(struct(ver, op)) AS s FROM {vview} "
            f"WHERE op != 'a' GROUP BY {idc})"
        )
        dead = f"SELECT {idc} FROM ({ovl})"
        alive = f"SELECT {idc}, ver FROM ({ovl}) WHERE op != 'd'"
        return (
            f"SELECT /*+ BROADCAST(d) */ {fcols} FROM {frame_sub} f "
            f"LEFT ANTI JOIN ({dead}) d ON f.{idc} = d.{idc}\n"
            f"UNION ALL\n"
            f"SELECT /*+ BROADCAST(a) */ {fcols} FROM {frame_sub} f "
            f"LEFT SEMI JOIN ({alive}) a "
            f"ON f.{idc} = a.{idc} AND f.ver = a.ver"
        )

    def close(self) -> None:
        from .. import caching

        self._drop_topk_views()
        for f in self._key_parts + self._val_parts:
            # in-memory parts are eager localCheckpoints (blocks freed
            # via the RDD); loaded/compacted parts are persisted scans
            if not caching.release_local_checkpoint(f):
                f.unpersist()
        self._key_parts = []
        self._val_parts = []


class MinHashIndex(_AppendOnlyIndex):
    """Stateful near-dup index over documents. In-memory state lives as
    per-batch persisted DataFrames; pass ``store_dir`` to also append
    accepted docs' band keys + shingle sets to parquet (``load``
    restores)."""

    _KEYS_NAME = "bands"
    _VALS_NAME = "shingles"

    @property
    def bands(self) -> DataFrame | None:
        return self.keys

    @property
    def shingles(self) -> DataFrame | None:
        return self.vals

    # -- the operator -------------------------------------------------------

    def ingest(
        self, batch_df: DataFrame, epoch: int | None = None
    ) -> DataFrame:
        """Probe ``batch_df`` (documents schema: doc_id, text, ...)
        against the index, extend the index with the survivors, and
        return the DROP decisions: (doc_id, dup_of, jaccard) where
        dup_of is the smallest surviving earlier doc the new doc
        verified against (deterministic representative) and jaccard is
        that pair's exact shingle Jaccard. ``epoch`` labels the commit
        for replay detection (defaults to the next unused number)."""
        if epoch is None:
            epoch = self.next_epoch()
        self._check_epoch(epoch)
        self._check_cdc_readd(batch_df)
        return self._probe_and_append(batch_df, epoch, "a", None)

    def apply_cdc(
        self, batch_df: DataFrame, epoch: int | None = None
    ) -> DataFrame:
        """Apply one CDC micro-batch (doc_id, text, lang, source, op):
        rows with op='d' DELETE their doc from the live corpus (its
        keys/shingles stop blocking future near-dups — a removed doc
        is not grounds to drop new arrivals); every other row is an
        UPSERT — the doc's old version stops blocking, the NEW text is
        probed against the live index (minus this batch's own ids, so
        an update never matches its own superseded version) and enters
        iff it survives. An upsert whose new text IS a near-dup of a
        live doc drops (decision row) AND tombstones the old version —
        the doc leaves the corpus either way.

        Historical decisions stand (docs already dropped as dups of a
        now-deleted doc stay dropped — the stream already emitted
        them; the reference's delete path likewise only removes the
        doc itself, ref: pgsync/sync.py:1254-1343).

        Contract and mechanics shared with BM25Index.apply_cdc: at
        most one row per doc_id (LWW-fold upstream), decisions carry
        the removed ids (deletes with NULL dup_of/jaccard + dropped
        upserts with their dup), versioned rows + tombstones fold at
        probe/compact time via the base overlay."""
        if epoch is None:
            epoch = self.next_epoch()
        self._check_epoch(epoch)
        # derived persist, never the caller's own frame: in
        # foreachBatch the stream already persisted batch_df, and a
        # persist/unpersist pair on the same plan would evict its
        # cache mid-epoch (r8 review finding). dels stays a lazy plan
        # over this cache — an eager checkpoint here would leak its
        # blocks (nothing releases it after the epoch commits).
        cdc = batch_df.select(*batch_df.columns).persist()
        try:
            # ONE driver action: per-id uniqueness, op vocabulary,
            # emptiness (an empty batch must not re-arm the fold)
            nonempty = self._validate_cdc_batch(cdc)
            dels = cdc.filter(F.col("op") == "d").select(self._ID_COL)
            # NULL-safe: NULL/missing op is an upsert (see
            # BM25Index.apply_cdc), never a silently-vanished row
            ups = cdc.filter(~F.col("op").eqNullSafe("d")).drop("op")
            if nonempty:
                self._has_cdc = True  # manifest records it at commit
                self._pending_overlay_delta = True
            decisions = self._probe_and_append(ups, epoch, "u", dels)
        finally:
            # _append consumed the delta flag at commit; clearing it
            # here too covers a probe that raised pre-commit (a later
            # bulk ingest must not count its rows as overlay)
            self._pending_overlay_delta = False
            cdc.unpersist()
        return self._maybe_autocompact(decisions)

    def _probe_and_append(
        self,
        batch_df: DataFrame,
        epoch: int,
        op: str,
        dels: DataFrame | None,
    ) -> DataFrame:
        sigs, cached = _signatures(batch_df)
        sigs = sigs.withColumn("fp", _fingerprint(F.col("sh"))).persist()
        cached = cached + [sigs]
        new_bands = _band_frame(sigs)

        held_bands, held_sh = self.bands, self.shingles
        if held_bands is None:
            decisions = self._dedup_decisions_empty(dels)
            self._append_versioned(sigs, decisions, epoch, op, dels)
            for c in cached:
                c.unpersist()
            return decisions

        overlay = None
        if self._has_cdc:
            # fold the CDC overlay so the probe sees only the LIVE
            # corpus: shadowed versions and tombstoned docs never
            # block. On the apply_cdc path (op != 'a') the batch's own
            # ids are excluded too — an UPDATE must never match its
            # own superseded version. On a bulk ingest the exclusion
            # must NOT apply: the held copy of a re-ingested id is
            # still live and must self-block the duplicate, exactly
            # like the append-only path (r8 review pass 2 finding).
            # Broadcast anti/semi joins — scan-shaped, no corpus
            # shuffle; skipped entirely on append-only indexes.
            extra_dead = None
            if op != "a":
                extra_dead = sigs.select(self._ID_COL)
                if dels is not None:
                    extra_dead = extra_dead.unionByName(dels)
            overlay = self._cdc_overlay(held_sh).persist()
            held_bands = self._cdc_live(held_bands, overlay, extra_dead)
            held_sh = self._cdc_live(held_sh, overlay, extra_dead)
        # candidate generation: shared with minhash_crosscorpus_pairs —
        # one grouped shuffle on (band, bucket), per-side hot-bucket
        # caps, inline index-side × batch-side pair expansion, drops
        # observed/logged so an operator can SEE the incremental index
        # losing LSH recall to boilerplate heat.
        cand = _crosscorpus_candidates(
            # slim to the banding triple: held keys carry ver (the CDC
            # version column) which the two-sided union must not see
            held_bands.select("doc_id", "band", "bucket"),
            new_bands,
            "old_id",
            "new_id",
            "minhash_index_probe",
        )
        ver = (
            cand.join(
                held_sh.select(
                    F.col("doc_id").alias("old_id"), F.col("sh").alias("sh1")
                ),
                "old_id",
            )
            .join(
                sigs.select(
                    F.col("doc_id").alias("new_id"), F.col("sh").alias("sh2")
                ),
                "new_id",
            )
            .select(
                "old_id",
                "new_id",
                round6(
                    F.size(F.array_intersect("sh1", "sh2")).cast("double")
                    / F.size(F.array_union("sh1", "sh2")).cast("double")
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        )
        # exact-fingerprint side channel: identical docs share ALL
        # band buckets, so once a duplicate cluster outgrows
        # MAX_BUCKET_WIDTH the LSH lane can no longer see it at all
        # (recall-through-other-bands does not exist for exact copies).
        # A slim equi-join on the sorted-shingle-set fingerprint
        # catches exact duplicates regardless of bucket heat — the
        # standard exact-hash lane an ingestion filter keeps next to
        # its near-dup index. Jaccard of identical sets is exactly 1.0.
        # The held side pre-aggregates to ONE representative per fp
        # (min doc_id — exactly the representative the decision agg
        # below would pick anyway): within-batch duplicates all enter
        # the index, so a hot boilerplate fp can hold thousands of
        # copies, and joining every copy against every new copy would
        # reintroduce the quadratic blow-up this lane exists to dodge.
        exact = (
            held_sh.groupBy("fp")
            .agg(F.min("doc_id").alias("old_id"))
            .join(sigs.select(F.col("doc_id").alias("new_id"), "fp"), "fp")
            .select("old_id", "new_id", F.lit(1.0).alias("jaccard"))
        )
        # UNION (distinct): an exact pair in an un-capped bucket shows
        # up in BOTH lanes with jaccard 1.0 — collapsing duplicates
        # keeps the representative join from fanning out.
        ver = ver.unionByName(exact).dropDuplicates(
            ["old_id", "new_id", "jaccard"]
        )
        # deterministic representative: the struct min orders by
        # old_id first, so this picks (min old_id, its jaccard) without
        # a self-join back onto ver.
        decisions = (
            ver.groupBy("new_id")
            .agg(F.min(F.struct("old_id", "jaccard")).alias("m"))
            .select(
                F.col("new_id").alias("doc_id"),
                F.col("m.old_id").alias("dup_of"),
                F.col("m.jaccard").alias("jaccard"),
            )
        )
        if dels is not None:
            decisions = decisions.unionByName(
                self._dedup_decisions_empty(dels)
            )
        decisions = decisions.persist()
        decisions.count()
        if overlay is not None:
            overlay.unpersist()

        surv_sigs = sigs.join(
            decisions.select("doc_id"), "doc_id", "left_anti"
        )
        self._append_versioned(surv_sigs, decisions, epoch, op, dels)
        for c in cached:
            c.unpersist()
        return owned(decisions, [decisions])

    def _delete_decisions(self, ids: DataFrame) -> DataFrame:
        """truncate() hook: removal decisions for ``ids``."""
        return self._dedup_decisions_empty(ids)

    def _dedup_decisions_empty(self, dels: DataFrame | None) -> DataFrame:
        """Decisions for a probe with no duplicate drops: empty, plus
        — in CDC mode — one row per DELETED doc (NULL dup_of/jaccard:
        removed from the corpus, but not as anyone's duplicate), so
        the stream's accepted/decisions split and stored_decisions
        replay carry deletes like any other removal."""
        empty = self.spark.createDataFrame([], _DECISION_SCHEMA)
        if dels is None:
            return empty
        return empty.unionByName(
            dels.select(
                "doc_id",
                F.lit(None).cast("bigint").alias("dup_of"),
                F.lit(None).cast("double").alias("jaccard"),
            )
        )

    def _append_versioned(
        self,
        surv_sigs: DataFrame,
        decisions: DataFrame,
        epoch: int,
        op: str,
        dels: DataFrame | None,
    ) -> None:
        """Append survivors with (ver=epoch, op) + delete/dropped-
        upsert tombstones. In CDC mode every DROPPED upsert tombstones
        too: the doc was updated, its old version is superseded, and
        the new version lost to a live dup — the doc leaves the corpus
        either way."""
        ver = F.lit(epoch).cast("long")
        vals = (
            surv_sigs.select("doc_id", "sh", "fp")
            .withColumn("ver", ver)
            .withColumn("op", F.lit(op))
        )
        if op != "a":
            # tombstone column types mirror the survivors' (the parts
            # union is by name AND type)
            sh_t = surv_sigs.schema["sh"].dataType
            fp_t = surv_sigs.schema["fp"].dataType
            vals = vals.unionByName(
                decisions.select(
                    "doc_id",
                    F.lit(None).cast(sh_t).alias("sh"),
                    F.lit(None).cast(fp_t).alias("fp"),
                    ver.alias("ver"),
                    F.lit("d").alias("op"),
                )
            )
        keys = _band_frame(surv_sigs).withColumn("ver", ver)
        self._append(keys, vals, decisions, epoch)


_SEM_DECISION_SCHEMA = "vec_id bigint, dup_of bigint, cosine double"


class EmbeddingIndex(_AppendOnlyIndex):
    """Stateful SEMANTIC near-dup index over embeddings — the
    incremental form of SemDeDup's pair stage: a new vector is
    rejected iff its exact cosine against some accepted vector is
    >= NEARDUP_COS, candidates blocked by banded sign-LSH buckets
    (similarity.py's scheme: N_BANDS bands of PLANES_PER_BAND sign
    planes).

    Differences from MinHashIndex that are structural, not accidental:
    - No hot-bucket cap and no exact-fingerprint lane. Sign-LSH
      buckets are STRUCTURAL cells (N_BANDS × 2^PLANES_PER_BAND), wide
      and skewed by design — the scale dial is PLANES_PER_BAND
      (exponentially narrower cells), not a width cutoff, and the
      probe join (held × batch on (band, bucket)) distributes hot
      cells across join tasks under AQE skew splits, exactly like
      embedding_neardup_pairs' self-join. Identical vectors always
      collide in every cell, so the LSH lane never goes blind to
      exact copies the way a capped minhash bucket does.
    - The verify payload is the embedding itself (vals frame
      (vec_id, embedding)); candidates join back by id so vectors are
      never dragged through the candidate shuffle.
    - Multi-probe by default (``probe_hamming=1``, the Lv et al. 2007
      fix ann_recall_eval motivates): each new key probes its band
      bucket plus every Hamming<=h perturbation, so a near-dup pair
      split by one sign flip in every band is still a candidate.
      Probing widens on the BATCH side only (the probe list explodes
      over the small frame); stored survivor keys stay unperturbed,
      and exact-cosine verify is unchanged — width buys candidate
      RECALL, never false drops. 0 restores the single-probe r6
      behavior.
    """

    _KEYS_NAME = "bands"
    _VALS_NAME = "vectors"
    _ID_COL = "vec_id"

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str | None = None,
        probe_hamming: int | None = None,
        overlay_cap: int | None = DEFAULT_OVERLAY_CAP,
    ):
        super().__init__(spark, store_dir, overlay_cap=overlay_cap)
        if probe_hamming is None:
            from .similarity import PROBE_HAMMING

            probe_hamming = PROBE_HAMMING
        self.probe_hamming = probe_hamming

    @staticmethod
    def _band_keys(df: DataFrame) -> DataFrame:
        """(vec_id, band, bucket) sign-LSH keys — the ONE banding
        scheme shared by new-batch probe keys and stored survivor keys
        (a drift between the two would silently blind the probe)."""
        from .similarity import N_BANDS, _band_bucket

        return df.select(
            "vec_id",
            F.posexplode(
                F.array(
                    *[
                        _band_bucket("embedding", b)
                        for b in range(N_BANDS)
                    ]
                )
            ).alias("band", "bucket"),
        )

    def ingest(
        self, batch_df: DataFrame, epoch: int | None = None
    ) -> DataFrame:
        """Probe ``batch_df`` (vec_id, embedding) against the index,
        extend the index with the survivors, and return the DROP
        decisions (vec_id, dup_of, cosine) — dup_of the smallest
        accepted vector the new one verified against."""
        if epoch is None:
            epoch = self.next_epoch()
        self._check_epoch(epoch)
        self._check_cdc_readd(batch_df)
        return self._probe_and_append(batch_df, epoch, "a", None)

    def apply_cdc(
        self, batch_df: DataFrame, epoch: int | None = None
    ) -> DataFrame:
        """Apply one CDC micro-batch (vec_id, embedding, op): op='d'
        deletes the vector from the live corpus (it stops blocking
        future near-dups); an UPSERT_OPS/NULL op is an UPSERT — old version
        stops blocking, the new embedding is probed against the live
        index (minus this batch's own ids) and enters iff it survives;
        a dropped upsert tombstones the old version too. Same
        contract/mechanics as MinHashIndex.apply_cdc (one row per
        vec_id, LWW-folded upstream)."""
        if epoch is None:
            epoch = self.next_epoch()
        self._check_epoch(epoch)
        # derived persist + lazy dels — see MinHashIndex.apply_cdc
        cdc = batch_df.select(*batch_df.columns).persist()
        try:
            nonempty = self._validate_cdc_batch(cdc)
            dels = cdc.filter(F.col("op") == "d").select("vec_id")
            # NULL-safe (see BM25Index.apply_cdc)
            ups = cdc.filter(~F.col("op").eqNullSafe("d")).drop("op")
            if nonempty:
                self._has_cdc = True  # manifest records it at commit
                self._pending_overlay_delta = True
            decisions = self._probe_and_append(ups, epoch, "u", dels)
        finally:
            self._pending_overlay_delta = False
            cdc.unpersist()
        return self._maybe_autocompact(decisions)

    def _delete_decisions(self, ids: DataFrame) -> DataFrame:
        """truncate() hook: removal decisions for ``ids``."""
        return self._sem_decisions_empty(ids)

    def _sem_decisions_empty(self, dels: DataFrame | None) -> DataFrame:
        empty = self.spark.createDataFrame([], _SEM_DECISION_SCHEMA)
        if dels is None:
            return empty
        return empty.unionByName(
            dels.select(
                "vec_id",
                F.lit(None).cast("bigint").alias("dup_of"),
                F.lit(None).cast("double").alias("cosine"),
            )
        )

    def _append_versioned(
        self,
        surv: DataFrame,
        decisions: DataFrame,
        epoch: int,
        op: str,
        dels: DataFrame | None,
    ) -> None:
        ver = F.lit(epoch).cast("long")
        vals = (
            surv.select("vec_id", "embedding")
            .withColumn("ver", ver)
            .withColumn("op", F.lit(op))
        )
        if op != "a":
            # tombstone embedding type mirrors the batch's (float vs
            # double element type must match for the parts union)
            emb_t = surv.schema["embedding"].dataType
            vals = vals.unionByName(
                decisions.select(
                    "vec_id",
                    F.lit(None).cast(emb_t).alias("embedding"),
                    ver.alias("ver"),
                    F.lit("d").alias("op"),
                )
            )
        keys = self._band_keys(surv).withColumn("ver", ver)
        self._append(keys, vals, decisions, epoch)

    def _probe_and_append(
        self,
        batch_df: DataFrame,
        epoch: int,
        op: str,
        dels: DataFrame | None,
    ) -> DataFrame:
        from .similarity import NEARDUP_COS, cosine6

        batch = batch_df.select("vec_id", "embedding").persist()
        new_keys = self._band_keys(batch)

        held_keys, held_vecs = self.keys, self.vals
        if held_keys is None:
            decisions = self._sem_decisions_empty(dels)
            # the whole first batch survives. _append installs an eager
            # CHECKPOINT of it as held state, so the batch's own cache
            # is released here — holding it too would duplicate batch 0
            # in executor memory for the life of the index (a leak the
            # old persist()-returns-self contract masked).
            self._append_versioned(batch, decisions, epoch, op, dels)
            batch.unpersist()
            return decisions

        overlay = None
        if self._has_cdc:
            # live-corpus fold before the probe (see MinHashIndex):
            # shadowed/tombstoned vectors never block; own-batch ids
            # excluded ONLY on the apply_cdc path (an update must not
            # match its superseded version; a bulk re-ingest must
            # still be self-blocked by its live held copy)
            extra_dead = None
            if op != "a":
                extra_dead = batch.select("vec_id")
                if dels is not None:
                    extra_dead = extra_dead.unionByName(dels)
            overlay = self._cdc_overlay(held_vecs).persist()
            held_keys = self._cdc_live(held_keys, overlay, extra_dead)
            held_vecs = self._cdc_live(held_vecs, overlay, extra_dead)
        # multi-probe expansion on the batch side only: a new key
        # probes its bucket plus every Hamming<=probe_hamming
        # perturbation within its band's sign bits; held keys (and the
        # survivor keys appended below) are never perturbed
        probe_keys = new_keys
        if self.probe_hamming:
            from .similarity import PLANES_PER_BAND, probe_buckets

            probe_keys = new_keys.select(
                "vec_id",
                "band",
                F.explode(
                    probe_buckets(
                        "bucket", PLANES_PER_BAND, self.probe_hamming
                    )
                ).alias("bucket"),
            )
        cand = (
            held_keys.select(F.col("vec_id").alias("old_id"), "band", "bucket")
            .join(
                probe_keys.select(
                    F.col("vec_id").alias("new_id"), "band", "bucket"
                ),
                ["band", "bucket"],
            )
            .select("old_id", "new_id")
            .distinct()
        )
        ver = (
            cand.join(
                held_vecs.select(
                    F.col("vec_id").alias("old_id"),
                    F.col("embedding").alias("v1"),
                ),
                "old_id",
            )
            .join(
                batch.select(
                    F.col("vec_id").alias("new_id"),
                    F.col("embedding").alias("v2"),
                ),
                "new_id",
            )
            .select(
                "old_id",
                "new_id",
                cosine6("v1", "v2").alias("cosine"),
            )
            .filter(F.col("cosine") >= NEARDUP_COS)
        )
        decisions = (
            ver.groupBy("new_id")
            .agg(F.min(F.struct("old_id", "cosine")).alias("m"))
            .select(
                F.col("new_id").alias("vec_id"),
                F.col("m.old_id").alias("dup_of"),
                F.col("m.cosine").alias("cosine"),
            )
        )
        if dels is not None:
            decisions = decisions.unionByName(
                self._sem_decisions_empty(dels)
            )
        decisions = decisions.persist()
        decisions.count()
        if overlay is not None:
            overlay.unpersist()

        surv = batch.join(decisions.select("vec_id"), "vec_id", "left_anti")
        self._append_versioned(surv, decisions, epoch, op, dels)
        batch.unpersist()
        return owned(decisions, [decisions])
