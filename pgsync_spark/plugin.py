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
import logging
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

log = logging.getLogger(__name__)


class Plugin(abc.ABC):
    """ref: pgsync/plugin.py Plugin ABC."""

    name: str = ""

    @abc.abstractmethod
    def transform(self, doc: dict, _id: str, _index: str) -> dict | None:
        ...


def auth_value(plugins: list[Plugin], key: str) -> str | None:
    """The reference's plugin ``auth`` hook (ref: pgsync/plugin.py:106-115):
    the first plugin exposing an ``auth`` method answers the key lookup
    (used for credential indirection, e.g. ES passwords); exceptions are
    logged and yield None, matching the reference exactly."""
    for plugin in plugins:
        if hasattr(plugin, "auth"):
            try:
                return plugin.auth(key)
            except Exception as e:  # noqa: BLE001 — parity with reference
                log.exception("Error calling auth: %s", e)
                return None
    return None


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
