"""Keyed overlay frame: base + batch-sized delta, compacted on cadence.

The cost shape every incrementally-maintained store in the engine
needs: applying a batch must cost O(batch + overlay), never O(store).
``TableMaterializer`` pioneered the pattern for bronze-layer table
snapshots; ``KeyedOverlay`` generalizes it for any keyed store
(the doc store and the lineage reverse index use it), including stores
with MULTIPLE rows per key (lineage has one row per key column value
per doc).

State:

- ``base``  — the big frame, checkpointed (or the initial lazy scan)
- ``keys``  — touched key tuples since the last compaction (eager ckpt)
- ``rows``  — current replacement rows for those keys (eager ckpt);
              a touched key with no rows is a delete

The read view is ``base ⟕anti keys ∪ rows`` — depth is ALWAYS 1, so
consumers re-execute one broadcast-guarded anti-join over the base
scan, never a per-batch fragment chain (the r2-measured failure mode of
letting lazy union chains grow). Folding into a fresh base happens
every ``compact_every`` applies or when the accumulated key bound
passes ``max(4x this batch, row_cap)`` — the Delta/Iceberg mapping is
MERGE writing deletion vectors + new files per batch with OPTIMIZE on a
cadence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .. import caching
from .joins import maybe_broadcast


class KeyedOverlay:
    def __init__(
        self,
        base: DataFrame,
        key_cols: list[str],
        compact_every: int = 8,
        row_cap: int = 65_536,
        owns_base: bool = False,
    ):
        """``owns_base``: whether compaction may release ``base``'s
        checkpoint blocks (False for bases whose blocks are shared with
        another store, e.g. the full-sync combined frame backing both
        docs and lineage — the owner releases those)."""
        self.base = base
        self.key_cols = list(key_cols)
        self.compact_every = compact_every
        self.row_cap = row_cap
        self.owns_base = owns_base
        self.keys: DataFrame | None = None
        self.rows: DataFrame | None = None
        self._key_bound = 0
        self._applies = 0
        # bumped whenever base is replaced by a compaction/reset — lets
        # the engine know a shared initial base has been superseded
        self.generation = 0
        self._view: DataFrame | None = None

    def view(self) -> DataFrame:
        """Current contents; cached so repeated reads (and identity
        checks) between state changes get the same frame."""
        if self._view is None:
            if self.keys is None:
                self._view = self.base
            else:
                self._view = self.base.join(
                    maybe_broadcast(self.keys, known_rows=self._key_bound),
                    on=self.key_cols,
                    how="left_anti",
                ).unionByName(self.rows)
        return self._view

    def _merged(
        self, touched_keys: DataFrame, rows: DataFrame, key_bound: int
    ) -> tuple[DataFrame, DataFrame]:
        """LAZY merged (keys, rows) overlay frames for one apply —
        prepare half of apply(); the caller checkpoints them (possibly
        in one parallel wave with other stores') and hands the results
        to :meth:`_commit`."""
        if self.keys is None:
            return touched_keys, rows
        guard = maybe_broadcast(touched_keys, known_rows=key_bound)
        merged_keys = self.keys.join(
            guard, on=self.key_cols, how="left_anti"
        ).unionByName(touched_keys)
        merged_rows = self.rows.join(
            guard, on=self.key_cols, how="left_anti"
        ).unionByName(rows)
        return merged_keys, merged_rows

    def _commit(
        self, new_keys: DataFrame, new_rows: DataFrame, key_bound: int
    ) -> None:
        """Install checkpointed overlay frames from :meth:`_merged`,
        release the superseded ones, and compact on cadence."""
        if self.keys is not None:
            caching.release_local_checkpoint(self.keys)
            caching.release_local_checkpoint(self.rows)
        self.keys, self.rows = new_keys, new_rows
        self._key_bound += key_bound
        self._applies += 1
        self._view = None
        if self._applies >= self.compact_every or self._key_bound > max(
            4 * key_bound, self.row_cap
        ):
            self.compact()

    def apply(
        self, touched_keys: DataFrame, rows: DataFrame, key_bound: int
    ) -> None:
        """Replace every row of ``touched_keys`` with ``rows``
        (O(batch + overlay): merges into the eager overlay checkpoints,
        never touches base). ``key_bound`` is an upper bound on
        touched-key count — the broadcast guard, accumulated into the
        overlay's own bound."""
        merged_keys, merged_rows = self._merged(touched_keys, rows, key_bound)
        new_keys, new_rows = caching.local_checkpoint_parallel(
            [merged_keys, merged_rows]
        )
        self._commit(new_keys, new_rows, key_bound)

    def compact(self) -> None:
        """Fold base+overlay into a fresh base checkpoint (OPTIMIZE
        analog); the only O(store) step, amortized over the cadence."""
        new_base = self.view().localCheckpoint(eager=True)
        if self.owns_base:
            caching.release_local_checkpoint(self.base)
        if self.keys is not None:
            caching.release_local_checkpoint(self.keys)
            caching.release_local_checkpoint(self.rows)
        self.base = new_base
        self.owns_base = True
        self.keys = self.rows = None
        self._key_bound = 0
        self._applies = 0
        self.generation += 1
        self._view = None

    def reset(self, base: DataFrame, owns_base: bool = False) -> None:
        """Swap in a new base (restore / truncate), dropping overlay
        state and releasing owned frames."""
        if self.owns_base:
            caching.release_local_checkpoint(self.base)
        if self.keys is not None:
            caching.release_local_checkpoint(self.keys)
            caching.release_local_checkpoint(self.rows)
        self.base = base
        self.owns_base = owns_base
        self.keys = self.rows = None
        self._key_bound = 0
        self._applies = 0
        self.generation += 1
        self._view = None

    def release(self) -> None:
        """Free every owned checkpoint (store teardown)."""
        self.reset(self.base.limit(0), owns_base=False)


def apply_parallel(
    applies: list[tuple["KeyedOverlay", DataFrame, DataFrame, int]],
) -> None:
    """Apply one batch to SEVERAL KeyedOverlay stores with all their
    overlay checkpoints submitted in ONE concurrent wave (the engine's
    doc + lineage stores: 4 serial driver round-trips → 1 wave). Each
    entry is (store, touched_keys, rows, key_bound); the stores must be
    distinct and their inputs independent."""
    lazy: list[DataFrame] = []
    for store, keys, rows, bound in applies:
        mk, mr = store._merged(keys, rows, bound)
        lazy += [mk, mr]
    cks = caching.local_checkpoint_parallel(lazy)
    for i, (store, _keys, _rows, bound) in enumerate(applies):
        store._commit(cks[2 * i], cks[2 * i + 1], bound)
