"""Size-guarded broadcast.

The incremental path joins big stores (docs, lineage, snapshots)
against key sets derived from a CDC batch. Those key sets are usually
tiny (normal batches), but a bulk backfill or a child-table TRUNCATE
can make "affected roots" the whole table — an unconditional
``F.broadcast`` then OOMs the driver/executors at scale. The reference
chunked its IN-list filters at FILTER_CHUNK_SIZE for exactly this
reason (ref: pgsync/sync.py:1464-1493, settings FILTER_CHUNK_SIZE).

``maybe_broadcast`` applies the hint only when the key set is provably
small: either the caller passes a known row bound (e.g. the batch's
event count, which bounds every frame derived from the batch), or the
frame is already materialized (localCheckpoint) so counting it is a
cheap cached scan. Above the limit the hint is omitted and the join
planner / AQE picks the strategy from runtime statistics — a shuffle
semi-join instead of a doomed broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Rows, not bytes: key frames here are a few slim columns, so 64k rows
# is far under any sane autoBroadcastJoinThreshold.
BROADCAST_ROW_LIMIT = 65536


def maybe_broadcast(df: DataFrame, known_rows: int | None = None) -> DataFrame:
    """Return ``broadcast(df)`` iff df is provably small.

    ``known_rows``: an upper bound the caller already knows (event
    count, prior count()). When None, the frame is counted — only do
    that on materialized (checkpointed/persisted) frames where the
    count is a cached scan, not a recompute.
    """
    n = df.count() if known_rows is None else known_rows
    return F.broadcast(df) if n <= BROADCAST_ROW_LIMIT else df
