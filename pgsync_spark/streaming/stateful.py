"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the engine's story for operators Spark lacks natively
(SURVEY §2.7 'stateful recompute' family): per-key state maintained
across micro-batches with Arrow-batch processing. The example operator
is a per-user running event counter + value accumulator — the shape of
a streaming feature aggregator (and the building block of a streaming
dedup: keep a seen-hash set per key in state).

Scale notes: state is partitioned by the grouping key and lives in the
state store (HDFS/RocksDB-backed on a cluster); each micro-batch only
touches keys present in the batch. Output rows are emitted per batch
with the updated running totals.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, events_total bigint, value_total double"
STATE_SCHEMA = "events_total bigint, value_total double"


def _update_user_state(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "events_total": [n], "value_total": [total]}
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """events(user_id, value, ...) stream → running per-user totals."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
