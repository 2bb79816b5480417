"""JSONL document sink (the test/e2e sink; ES is sinks/search.py).

Documents are already canonical JSON strings, so the writer is a plain
text write — executor-parallel, no driver collection. Elasticsearch's
bulk-NDJSON format is exactly this shape plus an action line, which is
why the search sink reuses it for dry-run output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_jsonl(docs: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write (_id, doc) as one JSON object per line:
    {"_id": ..., "_source": {...}}."""
    quoted_id = F.concat(
        F.lit('"'),
        F.regexp_replace(
            F.regexp_replace(F.col("_id"), r"\\", r"\\\\"), '"', '\\\\"'
        ),
        F.lit('"'),
    )
    lines = docs.select(
        F.concat(
            F.lit('{"_id":'),
            quoted_id,
            F.lit(',"_source":'),
            F.col("doc"),
            F.lit("}"),
        ).alias("value")
    )
    lines.write.mode(mode).text(path)
