"""One-SQL tree compiler: the whole denormalization query as a single
``spark.sql()`` text.

Why this exists (guide §7.3 — driver-side plan-construction cost):
``TreeCompiler`` builds the tree through ~50 DataFrame-level ops
(select/join/agg), and EACH op is an eager JVM analysis pass over the
accumulated subtree — ~1,350 py4j round-trips, ~0.34s per compile on
the bench host. The incremental engine pays that per micro-batch (the
restricted recompute re-compiles with the batch's root keys). Emitting
the identical query as ONE SQL text costs one parse+analyze (~0.04s)
plus a temp-view registration per table — the Catalyst tree, and
therefore the canonical JSON bytes, are unchanged.

Parity contract: this module mirrors ``TreeCompiler`` +
``docs.assemble_docs`` construct-for-construct — same traversal order,
same ``itertools.count`` name discipline (``__jk_*``/``__p_*``/
``__k_*`` come out identical), same broadcast-hint decisions
(operators/joins.maybe_broadcast), and the assembly layer reuses
``docs.assemble_exprs`` verbatim. Pinned by tests/test_sqlgen_parity.py:
optimized-plan ``sameResult`` plus byte-equality of (_id, doc) against
the TreeCompiler path for every registered topology, and the DuckDB
oracle gate downstream.

The one construct with no exact one-SQL rendering is the multi-pair
self-join OR decomposition (``_self_or_child_plan``'s
``dropDuplicates(subset)`` has no Spark SQL surface form) —
``compile_assembled`` detects it and falls back to ``TreeCompiler``,
so every tree still compiles.
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .. import exc
from ..catalog import Catalog
from ..node import (
    ONE_TO_MANY,
    SCALAR,
    SYSTEM_COLUMNS,
    ColumnSpec,
    ForeignKey,
    Node,
    Tree,
)
from ..operators.joins import BROADCAST_ROW_LIMIT


class SqlgenUnsupported(Exception):
    """Tree uses a construct with no exact one-SQL rendering; callers
    fall back to TreeCompiler."""


def _bt(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _s(text: str) -> str:
    """Spark SQL string literal (backslash IS an escape char)."""
    return "'" + text.replace("\\", "\\\\").replace("'", "''") + "'"


_JSON_OPTS = "map('ignoreNullFields', 'false')"


def _json_path_sql(spec: ColumnSpec) -> str:
    """Mirror of compiler._json_path_col as text."""
    path = "$"
    for token in spec.path:
        if token.lstrip("-").isdigit():
            path += f"[{int(token)}]"
        else:
            path += f".{token}"
    return f"get_json_object({_bt(spec.name)}, {_s(path)})"


def _struct_sql(fields: list[tuple[str, str]]) -> str:
    return "struct(" + ", ".join(f"{ex} AS {_bt(lbl)}" for lbl, ex in fields) + ")"


def _drop_falsy_sql(ex: str) -> str:
    """transform._drop_falsy as text (same Or-chain order)."""
    s = f"CAST({ex} AS STRING)"
    return (
        f"CASE WHEN ({ex} IS NULL) OR ({s} = '') OR ({s} = '0') "
        f"OR ({s} = '0.0') OR ({s} = 'false') "
        f"THEN CAST(NULL AS STRING) ELSE {s} END"
    )


def _transforms_sql(
    node: Node, fields: list[tuple[str, str]]
) -> list[tuple[str, str]]:
    """transform.apply_node_transforms mirrored on (label, sql) pairs:
    replace → rename → concat, reference order preserved."""
    spec = node.transform or {}
    if not spec:
        return fields
    out = list(fields)

    replace = spec.get("replace") or {}
    if replace:
        out2 = []
        for lbl, ex in out:
            if lbl in replace:
                for old, new in replace[lbl].items():
                    ex = f"replace(CAST({ex} AS STRING), {_s(old)}, {_s(new)})"
            out2.append((lbl, ex))
        out = out2

    rename = spec.get("rename") or {}
    if rename:
        out = [(rename.get(lbl, lbl), ex) for lbl, ex in out]

    concat = spec.get("concat") or {}
    if concat:
        specs = concat if isinstance(concat, list) else [concat]
        by_label = dict(out)
        for c in specs:
            cols = c.get("columns", [])
            dest = c.get("destination")
            delim = c.get("delimiter", "")
            parts = [
                _drop_falsy_sql(by_label[name])
                if name in by_label
                else _s(str(name))
                for name in cols
            ]
            out.append((dest, f"concat_ws({_s(delim)}, {', '.join(parts)})"))
    return out


@dataclass
class SqlNodePlan:
    """Mirror of compiler.NodePlan with SQL text instead of a frame."""

    sql: str
    join_keys: list[str]
    payload: str
    keys_cols: dict[tuple[str, str], str]


@dataclass
class SqlCompiled:
    """Mirror of compiler.CompiledDoc metadata; ``sql`` is the
    tree-level query (root pks + __f_* fields + __k_* arrays)."""

    sql: str
    tree: Tree
    root_pks: list[str]
    field_names: list[str]
    keys_cols: dict[tuple[str, str], str]
    field_is_array: dict[str, bool] = field(default_factory=dict)


def sql_expressible(catalog: Catalog, tree: Tree) -> bool:
    """True when every construct in ``tree`` has an exact one-SQL
    rendering (i.e. no multi-pair self-join OR decomposition)."""
    from ..catalog import self_join_pairs

    for node in tree.root.traverse_post_order():
        for ch in node.children:
            if (
                not ch.relationship.through_tables
                and ch.table == node.table
                and len(self_join_pairs(catalog.tables, node, ch)) != 1
            ):
                return False
    return True


class SqlTreeCompiler:
    """TreeCompiler's traversal, emitting text. ``views`` maps table →
    registered temp-view name; ``rk_view``/``rk_cols`` name the
    root-keys view and its (positional) columns; ``broadcast_rk``
    mirrors the maybe_broadcast decision the DataFrame path would make."""

    def __init__(
        self,
        catalog: Catalog,
        views: dict[str, str],
        rk_view: str | None = None,
        rk_cols: list[str] | None = None,
        broadcast_rk: bool = False,
        root_filters: list[dict] | None = None,
    ):
        self.catalog = catalog
        self.views = views
        self.rk_view = rk_view
        self.rk_cols = rk_cols or []
        self.broadcast_rk = broadcast_rk
        self.root_filters = root_filters
        self._ids = itertools.count()

    # ------------------------------------------------------------------
    def compile(self, tree: Tree) -> SqlCompiled:
        return self._root(tree)

    # ------------------------------------------------------------------
    def _columns_for(self, node: Node) -> list[ColumnSpec]:
        if node.columns:
            return node.columns
        cols = [
            c for c in self.catalog.columns(node.table) if c not in SYSTEM_COLUMNS
        ]
        return [ColumnSpec(name=c, label=c) for c in cols]

    def _base_sql(
        self,
        node: Node,
        extra_cols: set[str],
        key_exprs: list[str],
        filter_only_cols: frozenset[str] = frozenset(),
    ) -> tuple[str, list[ColumnSpec], set[str], list[str]]:
        """Returns (sql, specs, needed, scan_cols). ``filter_only_cols``
        are scanned (so a root WHERE can reference them — the
        DataFrame path gets this via ResolveMissingReferences) but NOT
        part of ``needed``: the caller trims them after the filter,
        exactly like the analyzer's restored Project."""
        specs = self._columns_for(node)
        table_cols = set(self.catalog.columns(node.table))
        needed = set(extra_cols)
        for s in specs:
            if s.name not in table_cols:
                raise exc.ColumnNotFoundError(
                    f"column {s.name!r} not on table {node.table!r}"
                )
            needed.add(s.name)
        needed.update(self.catalog.primary_key(node.table, node))
        scan_cols = sorted(needed | (filter_only_cols & table_cols))
        cols = [_bt(c) for c in scan_cols] + key_exprs
        sql = f"SELECT {', '.join(cols)} FROM {self.views[node.table]}"
        return sql, specs, needed, scan_cols

    def _payload_fields(
        self, node: Node, specs: list[ColumnSpec]
    ) -> list[tuple[str, str]]:
        df_schema = {
            f.name: f.dataType
            for f in self.catalog.df(node.table).schema.fields
        }
        out: list[tuple[str, str]] = []
        for s in specs:
            if s.is_json_path:
                out.append((s.label, _json_path_sql(s)))
                continue
            ex = _bt(s.name)
            dt = df_schema.get(s.name)
            if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
                ex = f"date_format({ex}, 'yyyy-MM-dd HH:mm:ss')"
            elif isinstance(dt, T.DateType):
                ex = f"date_format({ex}, 'yyyy-MM-dd')"
            out.append((s.label, ex))
        return out

    def _key_array_type(self, table: str, pk: str) -> str:
        """DDL of a lineage key array: array<pk-column-type>, or
        array<string> for composite tuple keys."""
        if "|" in pk:
            return "array<string>"
        dt = self.catalog.df(table).schema[pk].dataType
        return T.ArrayType(dt).simpleString()

    # ------------------------------------------------------------------
    def _child_plan(self, node: Node, parent: Node) -> SqlNodePlan:
        nid = next(self._ids)
        rel = node.relationship

        if rel.through_tables:
            return self._through_plan(node, parent, nid)

        fk = self.catalog.resolve_fk(parent, node)
        child_fk_cols = list(fk.child)

        body, specs, fields, keys_cols, body_cols = self._node_body(
            node, extra=set(child_fk_cols)
        )
        body, body_cols = self._prefilter_child(
            body, body_cols, child_fk_cols, list(fk.parent), parent
        )

        jk_names = [f"__jk_{nid}_{i}" for i in range(len(child_fk_cols))]

        if rel.type == ONE_TO_MANY:
            return self._aggregate_many(
                node, nid, body, fields, keys_cols, child_fk_cols, jk_names
            )

        payload_name = f"__p_{nid}"
        if rel.variant == SCALAR and len(specs) == 1 and not node.children:
            payload = fields[0][1]
        else:
            payload = _struct_sql(fields)
        sel = [
            f"{_bt(c)} AS {_bt(jk)}" for c, jk in zip(child_fk_cols, jk_names)
        ]
        sel.append(f"{payload} AS {_bt(payload_name)}")
        out_keys: dict[tuple[str, str], str] = {}
        for key, colname in keys_cols.items():
            sel.append(_bt(colname))
            out_keys[key] = colname
        return SqlNodePlan(
            f"SELECT {', '.join(sel)} FROM ({body})",
            jk_names,
            payload_name,
            out_keys,
        )

    def _node_body(
        self, node: Node, extra: set[str]
    ) -> tuple[str, list[ColumnSpec], list[tuple[str, str]], dict, list[str]]:
        """Returns (sql, specs, field (label, expr) pairs, keys_cols,
        output column order)."""
        child_extra: set[str] = set()
        child_plans: list[tuple[Node, object, list[str]]] = []
        for ch in node.children:
            if ch.relationship.through_tables:
                through = ch.relationship.through_tables[0]
                fk = self.catalog.foreign_key(node.table, through)
                parent_cols = list(fk.parent)
            elif ch.table == node.table:
                from ..catalog import self_join_pairs

                pairs = self_join_pairs(self.catalog.tables, node, ch)
                if len(pairs) != 1:
                    raise SqlgenUnsupported(
                        "multi-pair self-join (OR onclause) has no exact "
                        "one-SQL form"
                    )
                fk = ForeignKey(parent=(pairs[0][0],), child=(pairs[0][1],))
                parent_cols = [pairs[0][0]]
                child_extra.update(self.catalog.primary_key(node.table, node))
            else:
                fk = self.catalog.resolve_fk(node, ch)
                parent_cols = list(fk.parent)
            child_extra.update(parent_cols)
            child_plans.append((ch, fk, parent_cols))

        keys_cols: dict[tuple[str, str], str] = {}
        pks = self.catalog.primary_key(node.table, node)
        key_exprs: list[str] = []
        base_key_names: list[str] = []
        for pk in pks:
            kname = f"__k_{node.table}__{pk}__{next(self._ids)}"
            key_exprs.append(f"array({_bt(pk)}) AS {_bt(kname)}")
            keys_cols[(node.table, pk)] = kname
            base_key_names.append(kname)
        if len(pks) > 1:
            kname = f"__k_{node.table}__tuple__{next(self._ids)}"
            inner = ", ".join(f"CAST({_bt(p)} AS STRING)" for p in pks)
            key_exprs.append(
                f"array(concat_ws('|', {inner})) AS {_bt(kname)}"
            )
            keys_cols[(node.table, "|".join(pks))] = kname
            base_key_names.append(kname)

        fcols: frozenset[str] = frozenset()
        if node.parent is None and self.root_filters:
            fcols = frozenset(
                k for clause in self.root_filters for k in clause
            )
        sql, specs, needed, scan_cols = self._base_sql(
            node, extra | child_extra, key_exprs, filter_only_cols=fcols
        )
        # running output-column order of the body — the DataFrame path's
        # USING semi-joins REORDER columns (join keys first), and that
        # intermediate order feeds canonical attribute numbering, so the
        # optimized-plan parity the tests pin depends on tracking it
        cur_cols: list[str] = scan_cols + base_key_names
        if node.parent is None and self.rk_view is not None:
            rpks = list(self.catalog.primary_key(node.table, node))
            rk_sel = ", ".join(
                f"{_bt(c)} AS {_bt(p)}" for c, p in zip(self.rk_cols, rpks)
            )
            sql, cur_cols = self._using_semi(
                sql,
                cur_cols,
                rpks,
                f"SELECT DISTINCT {rk_sel} FROM {self.rk_view}",
            )
        if node.parent is None and self.root_filters:
            from ..operators.filters import filters_to_spark_sql

            # dtypes visible to the filter = the base projection the
            # DataFrame path calls .filter() on (filter-only columns
            # resolve as missing refs there, so they are NOT typed —
            # the untyped plain <=> branch, mirrored here)
            all_dtypes = dict(self.catalog.df(node.table).dtypes)
            dtypes = {c: all_dtypes[c] for c in needed if c in all_dtypes}
            sql = (
                f"SELECT * FROM ({sql}) WHERE "
                f"{filters_to_spark_sql(self.root_filters, dtypes)}"
            )
            extra_scanned = [c for c in scan_cols if c not in needed]
            if extra_scanned:
                # trim the filter-only columns back out — the analyzer's
                # ResolveMissingReferences restores the original
                # projection the same way
                keep = sorted(needed) + base_key_names
                sql = (
                    f"SELECT {', '.join(_bt(c) for c in keep)} "
                    f"FROM ({sql})"
                )
                cur_cols = keep
        fields = self._payload_fields(node, specs)

        if child_plans:
            # flat left-deep join over the base + one subquery per child.
            # Column ORDER mirrors the DataFrame path exactly (base scan
            # output, then each child's jk/payload/key columns in join
            # order; a key merge drops its two sources and appends at the
            # end — withColumn semantics): intermediate projection order
            # feeds canonical attribute numbering, so the optimized-plan
            # parity the tests pin depends on it. Merged key arrays
            # inline their concat chains (exactly what CollapseProject
            # makes of the withColumn-per-merge form).
            ordered: list[tuple[str, str]] = [
                (c, f"__b.{_bt(c)}") for c in cur_cols
            ]
            joins: list[str] = []
            for idx, (ch, fk, parent_cols) in enumerate(child_plans):
                plan = self._child_plan(ch, node)
                alias = f"__c{idx}"
                cond = " AND ".join(
                    f"__b.{_bt(pc)} = {alias}.{_bt(jk)}"
                    for pc, jk in zip(parent_cols, plan.join_keys)
                )
                joins.append(f"LEFT JOIN ({plan.sql}) {alias} ON {cond}")
                fields.append((ch.name, _bt(plan.payload)))
                ordered.extend(
                    (jk, f"{alias}.{_bt(jk)}") for jk in plan.join_keys
                )
                ordered.append(
                    (plan.payload, f"{alias}.{_bt(plan.payload)}")
                )
                ordered.extend(
                    (cn, f"{alias}.{_bt(cn)}")
                    for cn in plan.keys_cols.values()
                )
                for key, colname in plan.keys_cols.items():
                    if key in keys_cols:
                        merged = f"__k_{key[0]}__{key[1]}__{next(self._ids)}"
                        t = self._key_array_type(*key)
                        empty = f"CAST(array() AS {t})"
                        by_name = dict(ordered)
                        merged_ex = (
                            f"concat(coalesce({by_name[keys_cols[key]]}, "
                            f"{empty}), coalesce({by_name[colname]}, "
                            f"{empty}))"
                        )
                        ordered = [
                            (n, ex)
                            for n, ex in ordered
                            if n not in (keys_cols[key], colname)
                        ]
                        ordered.append((merged, merged_ex))
                        keys_cols[key] = merged
                    else:
                        keys_cols[key] = colname
            out_cols = [f"{ex} AS {_bt(n)}" for n, ex in ordered]
            sql = (
                f"SELECT {', '.join(out_cols)} "
                f"FROM ({sql}) __b {' '.join(joins)}"
            )

        if child_plans:
            cur_cols = [n for n, _ in ordered]
        fields = _transforms_sql(node, fields)
        return sql, specs, fields, keys_cols, cur_cols

    # ------------------------------------------------------------------
    def _aggregate_many(
        self,
        node: Node,
        nid: int,
        body: str,
        fields: list[tuple[str, str]],
        keys_cols: dict,
        group_cols: list[str],
        jk_names: list[str],
        extra_key_collect: dict | None = None,
    ) -> SqlNodePlan:
        rel = node.relationship
        payload_name = f"__p_{nid}"

        if rel.variant == SCALAR and len(node.columns) == 1 and not node.children:
            value = fields[0][1]
            payload_agg = (
                f"array_sort(collect_list({value})) AS {_bt(payload_name)}"
            )
        else:
            pstruct = _struct_sql(fields)
            payload_agg = (
                f"array_sort(collect_list({pstruct}), (x, y) -> CASE "
                f"WHEN to_json(x, {_JSON_OPTS}) < to_json(y, {_JSON_OPTS}) "
                f"THEN -1 "
                f"WHEN to_json(x, {_JSON_OPTS}) > to_json(y, {_JSON_OPTS}) "
                f"THEN 1 ELSE 0 END) AS {_bt(payload_name)}"
            )

        aggs = [payload_agg]
        out_keys: dict[tuple[str, str], str] = {}
        for key, colname in keys_cols.items():
            merged = f"__k_{key[0]}__{key[1]}__{next(self._ids)}"
            aggs.append(
                f"flatten(collect_list({_bt(colname)})) AS {_bt(merged)}"
            )
            out_keys[key] = merged
        for key, colexpr in (extra_key_collect or {}).items():
            merged = f"__k_{key[0]}__{key[1]}__{next(self._ids)}"
            aggs.append(f"collect_list({colexpr}) AS {_bt(merged)}")
            out_keys[key] = merged

        group_sel = ", ".join(
            f"{_bt(c)} AS {_bt(jk)}" for c, jk in zip(group_cols, jk_names)
        )
        group_by = ", ".join(_bt(c) for c in group_cols)
        sql = (
            f"SELECT {group_sel}, {', '.join(aggs)} FROM ({body}) "
            f"GROUP BY {group_by}"
        )
        return SqlNodePlan(sql, jk_names, payload_name, out_keys)

    # ------------------------------------------------------------------
    def _using_semi(
        self,
        body: str,
        body_cols: list[str],
        on_cols: list[str],
        keys_sql: str,
    ) -> tuple[str, list[str]]:
        """``df.join(maybe_broadcast(keys), on=on_cols, how="left_semi")``
        as text. A USING join reorders output columns (join keys first,
        then the remaining left columns in left order) — mirrored
        explicitly; returns (sql, new column order)."""
        hint = "/*+ BROADCAST(__sk) */ " if self.broadcast_rk else ""
        cond = " AND ".join(
            f"__b.{_bt(c)} = __sk.{_bt(c)}" for c in on_cols
        )
        on = set(on_cols)
        keep = list(on_cols) + [c for c in body_cols if c not in on]
        sel = ", ".join(f"__b.{_bt(c)}" for c in keep)
        sql = (
            f"SELECT {hint}{sel} FROM ({body}) __b LEFT SEMI JOIN "
            f"({keys_sql}) __sk ON {cond}"
        )
        return sql, keep

    def _prefilter_child(
        self,
        body: str,
        body_cols: list[str],
        child_cols: list[str],
        parent_cols: list[str],
        parent: Node,
    ) -> tuple[str, list[str]]:
        if self.rk_view is None or parent.parent is not None:
            return body, body_cols
        pks = list(self.catalog.primary_key(parent.table, parent))
        if not set(parent_cols).issubset(set(pks)):
            return body, body_cols
        rk_of = {p: c for c, p in zip(self.rk_cols, pks)}
        sel = ", ".join(
            f"{_bt(rk_of[p])} AS {_bt(c)}"
            for c, p in zip(child_cols, parent_cols)
        )
        return self._using_semi(
            body,
            body_cols,
            list(child_cols),
            f"SELECT DISTINCT {sel} FROM {self.rk_view}",
        )

    # ------------------------------------------------------------------
    def _through_plan(self, node: Node, parent: Node, nid: int) -> SqlNodePlan:
        through = node.relationship.through_tables[0]
        fk_parent = self.catalog.foreign_key(parent.table, through)
        fk_child = self.catalog.foreign_key(node.table, through)

        nbody, specs, fields, keys_cols, _ncols = self._node_body(
            node, extra=set(fk_child.parent)
        )

        tneeded = set(fk_parent.child) | set(fk_child.child)
        tpks = self.catalog.primary_key(through)
        tneeded.update(tpks)
        talias = f"__t_{nid}"
        tsql = (
            f"SELECT {', '.join(_bt(c) for c in sorted(tneeded))} "
            f"FROM {self.views[through]}"
        )
        tsql, _tcols = self._prefilter_child(
            tsql, sorted(tneeded), list(fk_parent.child),
            list(fk_parent.parent), parent
        )
        tsel = ", ".join(
            f"{_bt(c)} AS {_bt(f'{talias}_{c}')}" for c in sorted(tneeded)
        )
        tsql = f"SELECT {tsel} FROM ({tsql})"

        cond = " AND ".join(
            f"__n.{_bt(nc)} = __t.{_bt(f'{talias}_{tc}')}"
            for nc, tc in zip(fk_child.parent, fk_child.child)
        )
        joined = (
            f"SELECT * FROM ({tsql}) __t INNER JOIN ({nbody}) __n ON {cond}"
        )

        group_cols = [f"{talias}_{c}" for c in fk_parent.child]
        jk_names = [f"__jk_{nid}_{i}" for i in range(len(group_cols))]
        extra_keys: dict[tuple[str, str], str] = {
            (through, pk): _bt(f"{talias}_{pk}") for pk in tpks
        }
        if len(tpks) > 1:
            inner = ", ".join(
                f"CAST({_bt(f'{talias}_{pk}')} AS STRING)" for pk in tpks
            )
            extra_keys[(through, "|".join(tpks))] = f"concat_ws('|', {inner})"
        return self._aggregate_many(
            node,
            nid,
            joined,
            fields,
            keys_cols,
            group_cols,
            jk_names,
            extra_key_collect=extra_keys,
        )

    # ------------------------------------------------------------------
    def _root(self, tree: Tree) -> SqlCompiled:
        node = tree.root
        body, specs, fields, keys_cols, _cols = self._node_body(
            node, extra=set()
        )
        pks = list(self.catalog.primary_key(node.table, node))

        sel: list[str] = [_bt(pk) for pk in pks]
        field_names: list[str] = []
        field_is_array: dict[str, bool] = {}
        for lbl, ex in fields:
            sel.append(f"{ex} AS {_bt('__f_' + lbl)}")
            field_names.append(lbl)
        for key, colname in keys_cols.items():
            sel.append(_bt(colname))
        sql = f"SELECT {', '.join(sel)} FROM ({body})"
        for ch in node.children:
            if ch.relationship.type == ONE_TO_MANY:
                field_is_array[ch.name] = True
        return SqlCompiled(
            sql=sql,
            tree=tree,
            root_pks=pks,
            field_names=field_names,
            keys_cols=dict(keys_cols),
            field_is_array=field_is_array,
        )


# ---------------------------------------------------------------------------
# Integration: temp-view registration + the single spark.sql() call
# ---------------------------------------------------------------------------

_VIEW_IDS = itertools.count()


def _safe(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", name)


class ViewScope:
    """Caller-owned temp-view cache for repeated compiles (the
    incremental engine compiles once per micro-batch): stable view
    names per table, re-registered only when the table's frame object
    changed since the last compile — unchanged snapshot views cost
    zero py4j calls per batch. View names embed a fresh ``__sg<N>``
    prefix, so concurrent engines never collide; names are REUSED
    across batches (createOrReplaceTempView swaps the plan in place),
    so nothing accumulates in the session catalog. ``release()`` drops
    everything (engine teardown)."""

    def __init__(self, spark):
        self.spark = spark
        self.prefix = f"__sg{next(_VIEW_IDS)}"
        # table -> (frame, view name); the strong frame ref makes the
        # identity check sound (an id() after GC could collide)
        self._views: dict[str, tuple[DataFrame, str]] = {}

    def view_for(self, table: str, df: DataFrame) -> str:
        name = f"{self.prefix}_{_safe(table)}"
        cur = self._views.get(table)
        if cur is None or cur[0] is not df:
            df.createOrReplaceTempView(name)
            self._views[table] = (df, name)
        return name

    def rk_view(self, df: DataFrame) -> str:
        """Root-keys view — a fresh frame every batch, so always
        re-registered (same name, replaced in place)."""
        name = f"{self.prefix}_rk"
        df.createOrReplaceTempView(name)
        self._views["\x00rk"] = (df, name)
        return name

    def release(self) -> None:
        for _df, name in self._views.values():
            try:
                self.spark.catalog.dropTempView(name)
            except Exception:
                pass
        self._views.clear()


def compile_assembled(
    catalog: Catalog,
    tree: Tree,
    *,
    root_keys: DataFrame | None = None,
    root_keys_rows: int | None = None,
    root_filters: list[dict] | None = None,
    include_meta: bool = True,
    include_pks: bool = False,
    include_keys: bool = False,
    scope: ViewScope | None = None,
):
    """Compile + assemble in ONE ``spark.sql()`` — the fused form of
    ``TreeCompiler(...).compile(tree)`` + ``assemble_docs(...)``.

    Returns ``(DataFrame, meta)`` where ``meta`` carries the compiled
    keys inventory (``keys_cols``), root pks and field names — the
    same metadata CompiledDoc exposes. Falls back to the TreeCompiler
    path (identical results, more driver round-trips) for trees sqlgen
    cannot express.

    ``scope``: a caller-owned ViewScope for repeated compiles (the
    incremental engine passes its own); without one, views are
    registered under a fresh ``__sg<N>_`` prefix and dropped right
    after analysis, so concurrent compiles never collide and nothing
    leaks into the session catalog.
    """
    from ..operators.filters import sql_renderable_filters

    # root_keys + root_filters never co-occur on the hot paths (the
    # engine restricts by key, the queries filter literals); the
    # DataFrame analyzer's missing-ref restoration through a semi-join
    # is a plan shape sqlgen does not mirror, so that combo falls back
    # — as does a filter value with no exact SQL literal rendering
    # (out-of-bigint int: F.lit takes it, 'L'-suffixed text does not)
    if (
        not sql_expressible(catalog, tree)
        or (root_keys is not None and root_filters)
        or not sql_renderable_filters(root_filters)
    ):
        from .compiler import TreeCompiler
        from .docs import assemble_docs

        compiled = TreeCompiler(
            catalog,
            root_keys=root_keys,
            root_filters=root_filters,
            root_keys_rows=root_keys_rows,
        ).compile(tree)
        df = assemble_docs(
            compiled,
            include_meta=include_meta,
            include_pks=include_pks,
            include_keys=include_keys,
        )
        return df, compiled

    spark = catalog.spark
    owns_scope = scope is None
    if owns_scope:
        scope = ViewScope(spark)
    try:
        views = {
            t: scope.view_for(t, catalog.df(t)) for t in sorted(tree.tables())
        }
        rk_view = None
        rk_cols: list[str] = []
        broadcast_rk = False
        if root_keys is not None:
            rk_view = scope.rk_view(root_keys)
            rk_cols = list(root_keys.columns)
            n = root_keys.count() if root_keys_rows is None else root_keys_rows
            broadcast_rk = n <= BROADCAST_ROW_LIMIT

        meta = SqlTreeCompiler(
            catalog,
            views,
            rk_view=rk_view,
            rk_cols=rk_cols,
            broadcast_rk=broadcast_rk,
            root_filters=root_filters,
        ).compile(tree)

        from .docs import assemble_exprs

        cols = assemble_exprs(
            meta,
            include_meta=include_meta,
            include_pks=include_pks,
            include_keys=include_keys,
        )
        df = spark.sql(f"SELECT {', '.join(cols)} FROM ({meta.sql})")
        return df, meta
    finally:
        if owns_scope:
            scope.release()
