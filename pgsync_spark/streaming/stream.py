"""Structured Streaming front-end for the incremental engine.

The reference's three change sources — logical-slot polling, WAL push,
trigger/NOTIFY (ref: pgsync/sync.py:1720-2063, base.py:696-849) — all
reduce to "an ordered stream of Payload events". Here that stream is a
Structured Streaming source (a JSON file dir in tests; Kafka/Debezium in
production — same code path), and each micro-batch runs the engine's
``process_batch`` inside ``foreachBatch``:

- micro-batch atomicity replaces the reference's BEGIN/COMMIT buffering
  + LSN ACK (ref: sync.py:1947-2050): offsets advance only after the
  batch commits, and doc upserts are idempotent by ``_id``, so replays
  converge (exactly-once effect).
- the checkpointLocation replaces the reference's txid/binlog-pos
  checkpoint files (ref: sync.py:1581-1656).
- within a batch, events are folded per table (cdc.TableMaterializer) —
  the analog of the reference's (op, table) run-grouping and safe-insert
  reordering (ref: sync.py:625-636, 1855-1888).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..catalog import Catalog
from ..node import Tree
from .cdc import CDC_SCHEMA
from .incremental import IncrementalEngine


def start_cdc_stream(
    spark: SparkSession,
    engine,
    events_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
    poll_interval: str | None = None,
) -> StreamingQuery:
    """Stream JSON CDC events from a directory into the engine.

    ``engine`` is anything exposing ``process_batch(events_df)`` — a
    single IncrementalEngine or a multi-index SyncRunner (N trees off
    this one stream, the reference's one-consumer-per-document shape).

    ``maxFilesPerTrigger`` bounds micro-batch size — the analog of the
    reference's LOGICAL_SLOT_CHUNK_SIZE paging (ref: settings.py:40).
    ``poll_interval`` (e.g. "5 seconds") switches to a ProcessingTime
    trigger — the reference's polling mode for read-only sources
    (ref: pgsync/sync.py:2368-2382).
    """
    events = (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(events_dir)
    )

    def on_batch(batch_df, epoch_id: int):
        engine.process_batch(batch_df)

    writer = events.writeStream.foreachBatch(on_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if poll_interval is not None:
        writer = writer.trigger(processingTime=poll_interval)
    return writer.start()
