"""Status/metrics loop — the reference's console status thread
(ref: pgsync/sync.py:2084-2112 prints xlog/db/redis/search counters
once a second) re-expressed on Spark's native observability hook.

``EngineMetricsListener`` is a ``StreamingQueryListener``: Spark calls
it on every micro-batch with authoritative progress (input rows, batch
duration, state-store metrics) — no polling thread needed. It folds
those into a counters dict shaped like the reference's status line and
can merge an ``IncrementalEngine.stats`` dict for the doc-side counts.
"""

from __future__ import annotations

import json
import logging
import threading

from pyspark.sql.streaming import StreamingQueryListener

log = logging.getLogger(__name__)


class EngineMetricsListener(StreamingQueryListener):
    """Collects per-query progress; attach with
    ``spark.streams.addListener(listener)``."""

    def __init__(self, log_progress: bool = False):
        self._lock = threading.Lock()
        self.log_progress = log_progress
        # queryId -> rolling counters (the reference's status fields:
        # events seen / applied, plus Spark batch health)
        self.counters: dict[str, dict] = {}

    # -- StreamingQueryListener hooks ---------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self.counters[str(event.id)] = {
                "name": event.name,
                "batches": 0,
                "input_rows": 0,
                "last_batch_ms": None,
                "running": True,
            }

    def onQueryProgress(self, event) -> None:
        p = event.progress
        with self._lock:
            c = self.counters.setdefault(str(p.id), {"batches": 0, "input_rows": 0})
            c["batches"] += 1
            c["input_rows"] += int(p.numInputRows or 0)
            c["last_batch_ms"] = (p.durationMs or {}).get("triggerExecution")
            c["rows_per_sec"] = p.processedRowsPerSecond
        if self.log_progress:
            log.info("stream progress: %s", p.json)

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            c = self.counters.setdefault(str(event.id), {})
            c["running"] = False
            if event.exception:
                c["exception"] = str(event.exception)

    def onQueryIdle(self, event) -> None:  # Spark 3.5+
        pass

    # -- status line ---------------------------------------------------
    def status(self, engine_stats: dict | None = None) -> str:
        """One JSON status line (the reference prints a one-line counter
        summary; a JSON line is greppable and machine-readable)."""
        with self._lock:
            snapshot = {"streams": dict(self.counters)}
        if engine_stats:
            snapshot["engine"] = dict(engine_stats)
        return json.dumps(snapshot, default=str)
