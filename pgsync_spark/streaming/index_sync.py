"""Engine-owned search-index maintenance: one CDC stream keeps BOTH
the external search sink and the engine's own BM25 index in sync.

This closes the reference's actual topology end to end — DB events →
denormalized docs → continuously-updated search index (ref:
pgsync/sync.py:1495-1528 sync loop feeding search_client.py:100-212
bulk upserts/deletes) — with the index state owned by the engine
(functions/bm25_index.py) instead of an external cluster. The two
halves already existed separately: IncrementalEngine recomputes docs
and implicitly deletes the ones whose root rows vanished;
BM25Index.apply_cdc consumes op-bearing doc batches into its
versioned-overlay state. A ``SearchIndexMaintainer`` registered on
``engine.doc_consumers`` is the wire between them: each processed
batch's recomputed docs UPSERT and its disappeared ids DELETE, as one
CDC epoch.

Delivery semantics: the engine's foreachBatch gives at-least-once
delta delivery, and the maintainer is EFFECT-idempotent under replay —
re-applying a delta appends an upsert version whose content equals the
version it shadows, or a tombstone over a tombstone; every read folds
the overlay to the same live state. (This is deliberately weaker
machinery than start_dedup_stream's exactly-once epoch binding: doc
recompute is already idempotent upstream, so the stream checkpoint —
not the index manifest — is the source of truth here.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SearchIndexMaintainer:
    """Adapts an IncrementalEngine's per-batch doc delta into
    BM25Index CDC batches (or any index exposing apply_cdc/ingest/
    truncate with the (doc_id, text, lang, source, op) doc shape).

    ``id_expr`` / ``text_expr`` / ``lang_expr`` / ``source_expr`` are
    SQL expressions over the sink-facing doc schema (``_id`` string,
    ``doc`` JSON string, plus the tree's root PKs). The ``id_expr``
    default covers the common case — a single integer root PK (``_id``
    is its string form); a composite or string-PK tree supplies its
    own (e.g. a 64-bit hash). Point ``text_expr`` at the fields worth
    indexing (e.g. ``get_json_object(doc, '$.title')``, or a
    concat_ws of several) — the engine tokenizes on WHITESPACE only,
    so the raw-JSON default indexes coarse punctuation-glued tokens;
    it is a functioning fallback, not the recommended deployment.
    """

    def __init__(
        self,
        index,
        id_expr: str = "CAST(_id AS BIGINT)",
        text_expr: str = "doc",
        lang_expr: str = "CAST(NULL AS STRING)",
        source_expr: str = "CAST(NULL AS STRING)",
        compact_every: int | None = 8,
    ):
        self.index = index
        self.id_expr = id_expr
        self.text_expr = text_expr
        self.lang_expr = lang_expr
        self.source_expr = source_expr
        # segment-maintenance cadence: every apply() appends one index
        # segment (one more frame in the lazy union, one more overlay
        # slice), so query latency climbs within a compaction cycle
        # (soak: topk 2.2 -> 4.3s over 6 un-compacted batches) — the
        # same dial start_dedup_stream exposes; the index's own
        # overlay_cap still bounds the worst case independently
        self.compact_every = compact_every
        self._applied = 0

    def _doc_shape(self, docs: DataFrame) -> DataFrame:
        return docs.selectExpr(
            f"{self.id_expr} AS doc_id",
            f"CAST(({self.text_expr}) AS STRING) AS text",
            f"CAST(({self.lang_expr}) AS STRING) AS lang",
            f"CAST(({self.source_expr}) AS STRING) AS source",
        )

    def seed(self, docs: DataFrame | None) -> None:
        """Bulk-load the index from a full corpus (the engine's
        ``docs_for_sink()`` right after ``full_sync``) — op='a' rows,
        zero overlay state, exactly like any other bulk ingest.

        Raises on a NULL-producing ``id_expr`` (e.g. the default
        BIGINT cast against a composite or string root PK): every
        such doc would silently collapse onto one NULL identity in
        the index (review finding). One O(1)-result action, once per
        deployment; the per-batch CDC path is covered by apply_cdc's
        own entry contract."""
        if docs is None:
            return
        # persisted across the null-check action and the ingest, so
        # the shaping projection is evaluated once (review pass 2)
        shaped = self._doc_shape(docs).persist()
        try:
            bad = shaped.filter(
                F.col("doc_id").isNull()
            ).limit(1).collect()
            if bad:
                raise ValueError(
                    f"id_expr {self.id_expr!r} produced a NULL doc_id "
                    "— for a composite or string root PK supply an "
                    "id_expr that maps _id to a unique BIGINT (e.g. "
                    "a 64-bit hash of _id)"
                )
            self.index.ingest(shaped)
        finally:
            shaped.unpersist()

    def apply(self, upserts: DataFrame, deleted_ids: DataFrame) -> None:
        """One engine batch's doc delta as one CDC epoch: ``upserts``
        (sink-facing recomputed docs) become op='u' versions,
        ``deleted_ids`` (single ``_id`` column — docs whose root rows
        vanished) become tombstones. The engine guarantees the two id
        sets are disjoint, satisfying apply_cdc's one-row-per-doc
        contract."""
        ups = self._doc_shape(upserts).withColumn("op", F.lit("u"))
        dels = deleted_ids.selectExpr(
            f"{self.id_expr} AS doc_id"
        ).select(
            "doc_id",
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("string").alias("source"),
            F.lit("d").alias("op"),
        )
        self.index.apply_cdc(ups.unionByName(dels))
        self._applied += 1
        if self.compact_every and self._applied % self.compact_every == 0:
            self.index.compact()

    def truncate(self) -> None:
        """Root-table TRUNCATE: the doc corpus is cleared, so the
        index is too (its own committed epoch — see
        _AppendOnlyIndex.truncate)."""
        self.index.truncate()
