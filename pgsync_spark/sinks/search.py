"""Elasticsearch/OpenSearch sink.

Two layers, mirroring the reference's SearchClient:

- ``build_index_mapping``: derive the index mapping from the node tree's
  declared transform/mapping blocks + inferred field types
  (ref: pgsync/search_client.py:261-354 _create_setting/_build_mapping;
  type vocabulary ref: pgsync/constants.py:83-162).
- ``SearchSink``: bulk upsert/delete. In an environment with the
  elasticsearch-spark connector on the classpath it writes via
  ``df.write.format("org.elasticsearch.spark.sql")`` (executor-parallel
  bulk, the connector handles chunking/retries — the analog of the
  reference's streaming/parallel_bulk with chunk size 5000 / 100 MB,
  ref: pgsync/search_client.py:100-212, settings.py:145-167). This
  container has no ES jar and no cluster, so the network path is gated
  behind an import/config check and tests use the JSONL dry-run.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..node import Node, Tree

# ES core types the mapping generator emits (subset of the reference's
# vocabulary, ref: pgsync/constants.py:83-129)
_SPARK_TO_ES = {
    T.LongType: "long",
    T.IntegerType: "integer",
    T.ShortType: "integer",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.BooleanType: "boolean",
    T.TimestampType: "date",
    T.TimestampNTZType: "date",
    T.DateType: "date",
    T.StringType: "text",
}


def _field_mapping(dt: T.DataType, declared: dict | None = None) -> dict:
    if declared:
        return dict(declared)
    if isinstance(dt, T.StructType):
        return {"properties": {f.name: _field_mapping(f.dataType) for f in dt.fields}}
    if isinstance(dt, T.ArrayType):
        return _field_mapping(dt.elementType)  # ES arrays are implicit
    for cls, es in _SPARK_TO_ES.items():
        if isinstance(dt, cls):
            return {"type": es}
    return {"type": "text"}


def _declared_mappings(node: Node, out: dict, prefix: str = "") -> None:
    mapping = (node.transform or {}).get("mapping") or {}
    for field, spec in mapping.items():
        out[prefix + field] = spec
    for ch in node.children:
        _declared_mappings(ch, out, prefix=f"{prefix}{ch.name}.")


def build_index_mapping(tree: Tree, doc_schema: T.StructType) -> dict:
    """Index mapping from the structured doc schema, with node-declared
    ``transform.mapping`` entries taking precedence."""
    declared: dict = {}
    _declared_mappings(tree.root, declared)
    props = {}
    for f in doc_schema.fields:
        if f.name in ("_id", "_meta"):
            continue
        props[f.name] = _field_mapping(f.dataType, declared.get(f.name))
    return {"mappings": {"properties": props}}


class SearchSink:
    """Bulk doc writer; falls back to JSONL dry-run without a cluster."""

    def __init__(self, index: str, es_nodes: str | None = None, **conf: str):
        self.index = index
        self.es_nodes = es_nodes
        self.conf = conf

    def write(self, docs: DataFrame, mode: str = "append") -> None:
        if self.es_nodes is None:
            raise RuntimeError(
                "no es.nodes configured — use write_dry_run or configure a cluster"
            )
        (
            docs.write.format("org.elasticsearch.spark.sql")
            .option("es.nodes", self.es_nodes)
            .option("es.resource", self.index)
            .option("es.mapping.id", "_id")
            .option("es.write.operation", "upsert")
            .options(**self.conf)
            .mode(mode)
            .save()
        )

    def write_dry_run(self, docs: DataFrame, path: str) -> None:
        from .jsonl import write_jsonl

        write_jsonl(docs, path)

    def index_body(self, tree: Tree, doc_schema: T.StructType) -> str:
        return json.dumps(build_index_mapping(tree, doc_schema))
