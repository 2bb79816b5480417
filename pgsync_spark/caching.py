"""Scoped cache ownership for multi-consumer query pipelines.

Several operators (minhash/ngram dedup, clusters) persist intermediate
frames because one stage feeds multiple consumers — without the persist
the whole upstream DAG recomputes per consumer (measured 18× on the
signature stage). The frames must stay cached until the *caller* has
run its action on the returned result, so the operator cannot unpersist
them itself.

This registry makes the ownership explicit instead of leaking: an
operator registers the frames it persisted against the result it
returns; the caller releases them with ``release(result)`` (or
``release_all()`` between queries, as bench.py does) once it has
materialized what it needs.

At 100 TB the same seam is where a production pipeline would swap
``persist()`` for a durable checkpoint (write signatures to
Parquet/Delta and read back) — the scope object is the handle either
way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# result-frame id -> list of persisted intermediate frames
_SCOPES: dict[int, list[DataFrame]] = {}


def owned(result: DataFrame, cached: list[DataFrame]) -> DataFrame:
    """Register `cached` (persisted intermediates) as owned by `result`."""
    if cached:
        _SCOPES.setdefault(id(result), []).extend(cached)
    return result


def adopt(new_result: DataFrame, old_result: DataFrame) -> DataFrame:
    """Transfer cache ownership when a result frame is derived from
    another operator's result (e.g. clusters building on LSH pairs)."""
    cached = _SCOPES.pop(id(old_result), [])
    return owned(new_result, cached)


def release(result: DataFrame) -> None:
    """Unpersist every intermediate owned by `result`. Safe to call on
    frames that own nothing."""
    for df in _SCOPES.pop(id(result), []):
        df.unpersist()


def release_all() -> None:
    """Unpersist every registered intermediate (between bench queries)."""
    for cached in _SCOPES.values():
        for df in cached:
            df.unpersist()
    _SCOPES.clear()


def local_checkpoint_parallel(frames: list[DataFrame]) -> list[DataFrame]:
    """Eagerly localCheckpoint several INDEPENDENT frames, submitting
    the jobs concurrently from a thread pool.

    Each eager checkpoint is a full driver→scheduler round-trip; a CDC
    batch that materializes N per-table overlays serially pays N
    round-trips of mostly idle driver time. Concurrent submission
    overlaps them (Spark's scheduler handles multi-threaded job
    submission natively; measured ~2× on 4 small checkpoints,
    local[32]). Frames must not depend on one another."""
    if len(frames) <= 1:
        return [f.localCheckpoint(eager=True) for f in frames]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(min(len(frames), 8)) as ex:
        return list(ex.map(lambda f: f.localCheckpoint(eager=True), frames))


def release_local_checkpoint(df: DataFrame) -> bool:
    """Free the executor block storage behind an eager localCheckpoint.

    ``localCheckpoint`` persists the physical RDD; dropping the Python
    reference does NOT free the blocks until the JVM ContextCleaner
    happens to collect the RDD — an incremental engine that
    re-checkpoints its stores every batch therefore accumulates
    superseded store-sized blocks and pays the churn in GC pauses
    (observed as 10s→45s batch-time outliers at sf0.1).

    ``df`` must be the exact frame localCheckpoint returned (its
    analyzed plan is the LogicalRDD — projections over it don't match
    and return False). Releasing is safe for frames whose every
    consumer was itself eagerly checkpointed; re-reading ``df`` itself
    afterwards fails, so only release superseded frames.
    """
    try:
        node = df._jdf.queryExecution().analyzed()
        if node.getClass().getSimpleName() != "LogicalRDD":
            return False
        node.rdd().unpersist(False)
        return True
    except Exception:
        return False


def release_local_checkpoints(frames) -> int:
    """release_local_checkpoint over an iterable; returns #released."""
    return sum(1 for df in frames if release_local_checkpoint(df))
