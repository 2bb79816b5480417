"""Catalog: table → DataFrame resolution plus PK / FK metadata.

The reference reflects physical schemas and FK constraints from the
database catalog (ref: pgsync/base.py:306-345, FK discovery
pgsync/querybuilder.py:161-296). Parquet datasets carry no FK catalog,
so the engine keeps an explicit relationship registry with the same
precedence rule as the reference: an explicit ``foreign_key`` block in
the node config wins; otherwise the registry is consulted in both
directions (parent→child and child→parent).

A default registry for the driver's TPC-H-ish testdata ships here so
configs stay terse.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import exc
from .node import ForeignKey, Node


@dataclass(frozen=True)
class TableMeta:
    name: str
    primary_key: tuple[str, ...]
    # foreign keys declared on THIS table: {local_col_tuple: (ref_table, ref_col_tuple)}
    foreign_keys: dict[tuple[str, ...], tuple[str, tuple[str, ...]]] = field(
        default_factory=dict
    )
    # optional declared read schema (DDL string, e.g. "a INT, b STRING")
    # for schemaless formats (csv/json) — at scale, inferSchema means a
    # second full scan of the data before the first real one, so any
    # production csv/json table should declare its schema here
    schema: str | None = None


def _fk(cols, ref_table, ref_cols):
    return (tuple(cols), (ref_table, tuple(ref_cols)))


# Session-scoped columnar READER-PLAN cache: (realpath, fmt) →
# (tree_mtime_ns, resolved base DataFrame). Resolving a parquet/orc
# path is driver-side metadata work (DataSource resolution, file
# listing, footer schema merge — ~0.1s per table here), and every
# query invocation builds a fresh Catalog, so the same immutable
# testdata tables were re-resolved per invocation (guide §6:
# file-listing metadata is exactly what a session should cache across
# scans; table formats with manifests exist to avoid this cost
# entirely). Only the PLAN is cached — every action still scans the
# files. Invalidation: the stored stamp is the MAX mtime_ns over the
# path and every entry beneath it (one os.walk — proportional to the
# file count, which is the same listing the reader itself performs),
# so in-place rewrites of a nested part file and adds/removes inside
# partition subdirectories both miss the cache; a stale entry is
# REPLACED (the (realpath, fmt) key holds one value), never
# accumulated. Assumes no writer mutates bytes while back-dating
# mtimes. Keyed weakly by SparkSession: a torn-down session's entries
# vanish with it.
import weakref

_READER_PLANS: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _tree_mtime_ns(path: str) -> int:
    """MAX st_mtime_ns over ``path`` and everything beneath it — the
    reader-plan cache's change stamp (see _READER_PLANS)."""
    m = os.stat(path).st_mtime_ns
    for root, dirs, files in os.walk(path):
        for name in dirs + files:
            try:
                n = os.stat(os.path.join(root, name)).st_mtime_ns
            except OSError:
                continue
            if n > m:
                m = n
    return m


# Default registry for /root/testdata tables (see TESTDATA.md).
TPCH_TABLES: dict[str, TableMeta] = {
    "region": TableMeta("region", ("r_regionkey",)),
    "nation": TableMeta(
        "nation",
        ("n_nationkey",),
        dict([_fk(["n_regionkey"], "region", ["r_regionkey"])]),
    ),
    "customer": TableMeta(
        "customer",
        ("c_custkey",),
        dict([_fk(["c_nationkey"], "nation", ["n_nationkey"])]),
    ),
    "supplier": TableMeta(
        "supplier",
        ("s_suppkey",),
        dict([_fk(["s_nationkey"], "nation", ["n_nationkey"])]),
    ),
    "part": TableMeta("part", ("p_partkey",)),
    "orders": TableMeta(
        "orders",
        ("o_orderkey",),
        dict([_fk(["o_custkey"], "customer", ["c_custkey"])]),
    ),
    "lineitem": TableMeta(
        "lineitem",
        ("l_orderkey", "l_linenumber"),
        dict(
            [
                _fk(["l_orderkey"], "orders", ["o_orderkey"]),
                _fk(["l_partkey"], "part", ["p_partkey"]),
                _fk(["l_suppkey"], "supplier", ["s_suppkey"]),
            ]
        ),
    ),
    "events": TableMeta("events", ("event_id",)),
    "documents": TableMeta("documents", ("doc_id",)),
    "embeddings": TableMeta("embeddings", ("vec_id",)),
}


def event_time(df: DataFrame, name: str) -> Column:
    """THE event-time normalizer: a session-zone TIMESTAMP expression for
    ``df[name]`` regardless of how the source encoded it.

    Driver parquet carries tz-less ``timestamp[us]`` columns, which Spark 4
    reads as TIMESTAMP_NTZ — a type ``unix_micros`` and ``withWatermark``
    both reject. Under the engine's fixed UTC session timezone
    (session.py:34) the NTZ→LTZ cast is instant-preserving and identical
    to DuckDB's ``CAST(col AS TIMESTAMP)``, so oracle comparisons stay
    exact. Handled encodings:

    - TIMESTAMP        → unchanged
    - TIMESTAMP_NTZ    → cast (same instant under UTC session)
    - long nanos-since-epoch (TIMESTAMP(NANOS) parquet read with
      nanosAsLong) → integer div 1000 then timestamp_micros; ``div``
      keeps full precision where a double round-trip would not
    - DATE             → midnight UTC

    Every query/stream that needs epoch arithmetic or a watermark goes
    through here (or :func:`time_micros`) — never call
    ``unix_micros(F.col(...))`` on a raw column.
    """
    dtype = df.schema[name].dataType
    if isinstance(dtype, T.LongType):
        return F.timestamp_micros(F.expr(f"`{name}` div 1000"))
    return F.col(name).cast("timestamp")


def time_micros(df: DataFrame, name: str) -> Column:
    """Micros-since-epoch BIGINT for an event-time column; comparable
    with DuckDB ``epoch_us(CAST(col AS TIMESTAMP))`` under a UTC session."""
    return F.unix_micros(event_time(df, name))


def with_event_time(df: DataFrame, name: str) -> DataFrame:
    """Replace ``name`` with its normalized session-zone TIMESTAMP — the
    form ``withWatermark``/``window`` require on streaming DataFrames."""
    return df.withColumn(name, event_time(df, name))


def _restore_nano_timestamps(df: DataFrame, path: str) -> DataFrame:
    """TIMESTAMP(NANOS) parquet columns are read as long (see session.py
    nanosAsLong); convert back to microsecond timestamps. Integer `div`
    keeps full precision (ns-since-epoch exceeds double's 2^53)."""
    import glob as _glob

    import pyarrow.parquet as pq
    import pyarrow as pa
    from pyspark.sql import functions as F

    if os.path.isdir(path):
        # directory-style parquet (what Spark writes): all parts share
        # one schema — read one footer, not the data. recursive glob
        # also reaches partitioned layouts (key=value/ subdirectories)
        parts = sorted(
            _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        if not parts:
            return df
        path = parts[0]
    schema = pq.read_schema(path)
    for fld in schema:
        if pa.types.is_timestamp(fld.type) and fld.type.unit == "ns":
            df = df.withColumn(
                fld.name, F.timestamp_micros(F.expr(f"`{fld.name}` div 1000"))
            )
    return df


def find_fk(
    tables: dict[str, TableMeta], parent_table: str, child_table: str
) -> ForeignKey:
    """Bidirectional FK discovery over a metadata registry.

    Mirrors the reference (ref: pgsync/querybuilder.py:161-296): first an
    FK on the child referencing the parent, then FK-on-parent.
    """
    child_meta = tables.get(child_table)
    if child_meta:
        for local_cols, (ref_table, ref_cols) in child_meta.foreign_keys.items():
            if ref_table == parent_table:
                return ForeignKey(parent=ref_cols, child=local_cols)
    parent_meta = tables.get(parent_table)
    if parent_meta:
        for local_cols, (ref_table, ref_cols) in parent_meta.foreign_keys.items():
            if ref_table == child_table:
                return ForeignKey(parent=local_cols, child=ref_cols)
    raise exc.ForeignKeyError(
        f"no foreign key path between {parent_table!r} and {child_table!r}; "
        "declare relationship.foreign_key in the node config"
    )


def self_join_pairs(
    tables: dict[str, TableMeta], parent_node: Node, child_node: Node
) -> list[tuple[str, str]]:
    """Column-level (parent_col, child_col) join pairs for a self-join
    child (child.table == parent.table). The reference OR-combines the
    onclause for self-joins (ref: pgsync/querybuilder.py:575-577), so
    callers join on ANY pair matching:

    - declared ``relationship.foreign_key``: its column pairs as
      declared (explicit config wins, one direction);
    - discovered self-FK in the registry: BOTH directions — the
      reference's reflected FK map merges parent and child sides for
      same-table joins, yielding e.g. parent.id = child.node_id OR
      parent.node_id = child.id.
    """
    rel_fk = child_node.relationship.foreign_key
    if rel_fk is not None:
        return list(zip(rel_fk.parent, rel_fk.child))
    meta = tables.get(child_node.table)
    pairs: list[tuple[str, str]] = []
    if meta:
        for local_cols, (ref_table, ref_cols) in meta.foreign_keys.items():
            if ref_table == child_node.table:
                pairs.extend(zip(ref_cols, local_cols))
                pairs.extend(zip(local_cols, ref_cols))
    if not pairs:
        raise exc.ForeignKeyError(
            f"no self-referential foreign key on {child_node.table!r}; "
            "declare relationship.foreign_key in the node config"
        )
    return list(dict.fromkeys(pairs))


class Catalog:
    """Resolves tables to DataFrames and answers PK/FK questions.

    ``base_dir`` is a directory of ``<table>.parquet`` files (the driver's
    sf dirs). Registered DataFrames (``register_df``) take precedence —
    used by tests and the incremental engine to overlay updated snapshots.
    """

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str | None = None,
        tables: dict[str, TableMeta] | None = None,
    ):
        self.spark = spark
        self.base_dir = base_dir
        self.tables = dict(tables if tables is not None else TPCH_TABLES)
        self._dfs: dict[str, DataFrame] = {}
        # bumped on every register_df/unregister: consumers that memoize
        # plans COMPILED AGAINST this catalog (IncrementalEngine's
        # full-corpus plan) key on it, so a snapshot-view swap
        # invalidates them
        self.version = 0

    # --- table resolution -------------------------------------------------
    def register_df(self, name: str, df: DataFrame, meta: TableMeta | None = None):
        self._dfs[name] = df
        self.version += 1
        if meta is not None:
            self.tables[name] = meta

    def register_meta(self, meta: TableMeta):
        self.tables[meta.name] = meta

    def unregister(self, name: str) -> None:
        """Drop a registered frame so the next df() re-resolves from
        base_dir (used when a registered snapshot view is released)."""
        self._dfs.pop(name, None)
        self.version += 1

    # columnar formats first: parquet/orc scans get predicate pushdown,
    # column pruning, and vectorized reads for free; json/csv are
    # row-formats Spark must fully parse — supported for interop, with
    # the scale caveats in the reader branches below
    FORMATS = ("parquet", "orc", "json", "csv", "jsonl")

    def df(self, name: str) -> DataFrame:
        if name in self._dfs:
            return self._dfs[name]
        if self.base_dir is None:
            raise exc.TableNotFoundError(f"no base_dir and {name!r} not registered")
        for fmt in self.FORMATS:
            path = os.path.join(self.base_dir, f"{name}.{fmt}")
            if os.path.exists(path):
                df = self._read(path, fmt, name)
                self._dfs[name] = df
                return df
        raise exc.TableNotFoundError(
            f"no {name}.{{{','.join(self.FORMATS)}}} under {self.base_dir}"
        )

    def _read(self, path: str, fmt: str, name: str) -> DataFrame:
        if fmt in ("parquet", "orc"):
            # plan-cached across Catalog instances (see _READER_PLANS)
            try:
                key = (os.path.realpath(path), fmt)
                stamp = _tree_mtime_ns(path)
                plans = _READER_PLANS.setdefault(self.spark, {})
                cached = plans.get(key)
                if cached is not None and cached[0] == stamp:
                    return cached[1]
            except OSError:
                plans, key, stamp = None, None, None
            if fmt == "parquet":
                df = _restore_nano_timestamps(
                    self.spark.read.parquet(path), path
                )
            else:
                df = self.spark.read.orc(path)
            if plans is not None:
                plans[key] = (stamp, df)
            return df
        meta = self.tables.get(name)
        declared = meta.schema if meta else None
        if fmt in ("json", "jsonl"):
            reader = self.spark.read
            # without a declared schema Spark scans the data once just
            # to infer one — fine for dev tables, wrong at 100 TB
            return (
                reader.schema(declared).json(path)
                if declared
                else reader.json(path)
            )
        # csv: header row expected; declared schema avoids the inference
        # pre-scan AND the all-strings trap
        reader = self.spark.read.option("header", "true")
        return (
            reader.schema(declared).csv(path)
            if declared
            else reader.option("inferSchema", "true").csv(path)
        )

    def columns(self, name: str) -> list[str]:
        return self.df(name).columns

    # --- keys -------------------------------------------------------------
    def primary_key(self, name: str, node: Node | None = None) -> tuple[str, ...]:
        if node is not None and node.primary_key:
            return tuple(node.primary_key)
        meta = self.tables.get(name)
        if meta is None or not meta.primary_key:
            raise exc.PrimaryKeyNotFoundError(f"no primary key registered for {name!r}")
        return meta.primary_key

    def foreign_key(self, parent_table: str, child_table: str) -> ForeignKey:
        """Resolve FK pairs between parent and child as (parent_cols, child_cols).

        Mirrors the reference's bidirectional discovery
        (ref: pgsync/querybuilder.py:161-296): first look for an FK on the
        child referencing the parent, then for an FK on the parent
        referencing the child (FK-on-parent, e.g. orders→customer).
        """
        return find_fk(self.tables, parent_table, child_table)

    def resolve_fk(self, parent_node: Node, child_node: Node) -> ForeignKey:
        """Explicit config FK wins over registry discovery.

        ref precedence: pgsync/querybuilder.py:326-362 — explicit
        ``foreign_key`` honored only relative to the tree parent.
        """
        if child_node.relationship.foreign_key is not None:
            return child_node.relationship.foreign_key
        return self.foreign_key(parent_node.table, child_node.table)
