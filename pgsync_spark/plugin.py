"""Plugin UDF chain: user transforms applied to each document.

Reference parity (ref: pgsync/plugin.py:15-115): plugins subclass
``Plugin``, declare a ``name``, and implement
``transform(doc, _id, _index) -> dict | None``; they run in declared
order and returning a falsy value drops the document (used e.g. by the
masking and enrichment samples in the reference's plugins/).

Spark-first execution: the chain runs over Arrow batches via
mapInPandas — one Python round-trip for the whole chain regardless of
plugin count, not a per-row UDF per plugin. Docs travel as JSON strings
(the engine's canonical form), so arbitrary dict-shaped edits are
allowed without schema gymnastics; the output schema stays
``(_id, doc)``.
"""

from __future__ import annotations

import abc
import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame


class Plugin(abc.ABC):
    """ref: pgsync/plugin.py Plugin ABC."""

    name: str = ""

    @abc.abstractmethod
    def transform(self, doc: dict, _id: str, _index: str) -> dict | None:
        ...


def apply_plugins(
    docs: DataFrame, plugins: list[Plugin], index: str = ""
) -> DataFrame:
    """Run the plugin chain over a (_id, doc) DataFrame."""
    if not plugins:
        return docs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for _id, doc_json in zip(pdf["_id"], pdf["doc"]):
                doc = json.loads(doc_json)
                for plugin in plugins:
                    doc = plugin.transform(doc, _id=_id, _index=index)
                    if not doc:  # falsy → drop the document
                        break
                else:
                    ids.append(_id)
                    outs.append(json.dumps(doc, separators=(",", ":")))
            yield pd.DataFrame({"_id": ids, "doc": outs})

    return docs.select("_id", "doc").mapInPandas(run, "_id string, doc string")
