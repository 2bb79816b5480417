"""Tree → DataFrame denormalization compiler — the engine core.

Reference semantics being reproduced (toluaina/pgsync @ /root/reference):

- Every generated join is LEFT OUTER (ref: pgsync/querybuilder.py:78,
  578-582, 729-733, 901-905) on equi FK pairs, composite keys iterated
  positionally (ref: pgsync/querybuilder.py:506-510).
- one_to_many children become grouped JSON arrays: the reference emits
  ``JSON_AGG(JSON_BUILD_OBJECT(...)) GROUP BY fk`` inside a correlated
  lateral subquery (ref: pgsync/querybuilder.py:936-992). Spark-first
  shape: the child subplan is **decorrelated** —
  ``child.groupBy(fk).agg(collect_list(struct(...)))`` then left-joined
  to the parent. Catalyst would rewrite the correlated form to exactly
  this; writing it directly keeps the plan a plain shuffle-agg + join
  that scales horizontally (aggregation happens map-side first).
- one_to_one children join directly and are wrapped as a struct
  (variant=object) or inlined as a bare value (variant=scalar)
  (ref: pgsync/querybuilder.py:941-961).
- through tables (many-to-many): node subplan joins the through table on
  the node-side FK, aggregates by the through table's parent-side FK,
  and the through table's PKs join the ``_keys`` lineage
  (ref: pgsync/querybuilder.py:584-841, through-keys 764-783).
- ``_keys`` lineage: every node contributes its PK values per table,
  bubbled up the tree and squashed at the root into
  ``_meta: {table: {pk: [sorted distinct values]}}``
  (ref: pgsync/querybuilder.py:364-386, pgsync/transform.py:230-288).
- ``_id`` = root PK values joined with "|" (ref: pgsync/sync.py:527-535).
- Self-referential trees (child.table == parent.table) are supported via
  per-node unique aliases; the reference switches the onclause combinator
  AND→OR for self joins (ref: pgsync/querybuilder.py:575-577) — we join
  on the declared/discovered FK pairs which covers the tested topology.

Determinism (stricter than the reference, whose JSON_AGG order is
unspecified): object arrays are sorted by child PK, scalar arrays by
value, ``_meta`` arrays sorted + distinct. This makes output stable
across partitionings/cluster sizes — required at 100 TB where task
scheduling is nondeterministic.

Scale design: all operators are declarative DataFrame ops (no UDFs, no
driver-side loops), so Catalyst applies column pruning + filter pushdown
into the parquet scans, map-side partial aggregation before each
grouped collect, and AQE handles skewed FK distributions. Dimension-size
child tables broadcast automatically under the session threshold.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import exc
from ..catalog import Catalog
from ..node import (
    OBJECT,
    ONE_TO_MANY,
    ONE_TO_ONE,
    SCALAR,
    ColumnSpec,
    Node,
    Tree,
)
from ..transform import apply_node_transforms


def _json_path_col(spec: ColumnSpec) -> Column:
    """Compile a JSON path column (``doc->x->1->z``) against a string
    JSON column using get_json_object (ref: pgsync/node.py:197-303).

    ``->``/``#>`` keep JSON text of the sub-tree; ``->>``/``#>>`` extract
    text. get_json_object returns strings either way, which matches the
    text form; for non-text we keep the raw JSON snippet string.
    """
    path = "$"
    for token in spec.path:
        if token.lstrip("-").isdigit():
            path += f"[{int(token)}]"
        else:
            path += f".{token}"
    return F.get_json_object(F.col(spec.name), path)


@dataclass
class NodePlan:
    """Result of compiling one (child) node subtree."""

    df: DataFrame
    join_keys: list[str]  # child-side join column names in df
    payload: str  # payload column name in df
    keys_cols: dict[tuple[str, str], str]  # (table, pk_col) -> array column name


@dataclass
class CompiledDoc:
    """Root compilation result."""

    df: DataFrame  # root pks + per-field columns + keys arrays
    tree: Tree
    root_pks: list[str]
    field_names: list[str]  # document fields in declared order
    keys_cols: dict[tuple[str, str], str]
    field_is_array: dict[str, bool] = field(default_factory=dict)


class TreeCompiler:
    def __init__(
        self,
        catalog: Catalog,
        root_keys: DataFrame | None = None,
        root_filters: list[dict] | None = None,
        root_keys_rows: int | None = None,
    ):
        """``root_keys``: optional DataFrame of root PK values — the root
        scan is left_semi-joined against it immediately, so the whole
        tree recomputes only for those keys (the incremental engine's
        recompute-by-key path, ref: pgsync/sync.py:1345-1493 re-entering
        sync(filters=...)). A size-guarded semi-join replaces the
        reference's chunked IN-list filters: broadcast when the key set
        is provably small (``root_keys_rows`` — callers that already
        counted pass it), else the planner/AQE picks the strategy.

        ``root_filters``: literal filter clauses in the reference's spec
        (list=OR of dict=AND, ref: pgsync/querybuilder.py:100-132),
        applied at the root scan only — the reference's filter-placement
        rule (ref: querybuilder.py:469-471); Catalyst pushes the
        predicate into the parquet scan."""
        self.catalog = catalog
        self.root_keys = root_keys
        self.root_filters = root_filters
        self.root_keys_rows = root_keys_rows
        self._ids = itertools.count()

    # ------------------------------------------------------------------
    def compile(self, tree: Tree) -> CompiledDoc:
        return self._root(tree)

    def compile_docs(self, tree: Tree) -> DataFrame:
        """Full pipeline: compile + assemble (_id, _meta, doc JSON)."""
        from .docs import assemble_docs

        return assemble_docs(self.compile(tree))

    # ------------------------------------------------------------------
    def _columns_for(self, node: Node) -> list[ColumnSpec]:
        """Declared columns, or all table columns minus system columns
        (ref: pgsync/node.py:150-157)."""
        if node.columns:
            return node.columns
        from ..node import SYSTEM_COLUMNS

        cols = [
            c for c in self.catalog.columns(node.table) if c not in SYSTEM_COLUMNS
        ]
        return [ColumnSpec(name=c, label=c) for c in cols]

    def _base_df(
        self,
        node: Node,
        extra_cols: set[str],
        extra_exprs: tuple[Column, ...] = (),
    ) -> tuple[DataFrame, list[ColumnSpec]]:
        """Scan with explicit projection so column pruning reaches
        parquet. ``extra_exprs`` (the node's key-lineage arrays) ride
        the same select — one analysis pass instead of two."""
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
        df = self.catalog.df(node.table).select(*sorted(needed), *extra_exprs)
        return df, specs

    def _payload_fields(self, node: Node, specs: list[ColumnSpec]) -> list[tuple[str, Column]]:
        """(label, column) pairs for this node's own projected fields, with
        JSON-path extraction and canonical rendering of temporal types."""
        df_schema = {f.name: f.dataType for f in self.catalog.df(node.table).schema.fields}
        out: list[tuple[str, Column]] = []
        for s in specs:
            if s.is_json_path:
                out.append((s.label, _json_path_col(s)))
                continue
            col = F.col(s.name)
            dt = df_schema.get(s.name)
            if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
                col = F.date_format(col, "yyyy-MM-dd HH:mm:ss")
            elif isinstance(dt, T.DateType):
                col = F.date_format(col, "yyyy-MM-dd")
            out.append((s.label, col))
        return out

    # ------------------------------------------------------------------
    def _child_plan(self, node: Node, parent: Node) -> NodePlan:
        """Compile a child subtree into a joinable DataFrame."""
        nid = next(self._ids)
        rel = node.relationship

        if rel.through_tables:
            return self._through_plan(node, parent, nid)

        fk = self.catalog.resolve_fk(parent, node)
        child_fk_cols = list(fk.child)

        df, specs, fields, keys_cols = self._node_body(node, extra=set(child_fk_cols))
        df = self._prefilter_child(df, child_fk_cols, list(fk.parent), parent)

        jk_names = [f"__jk_{nid}_{i}" for i in range(len(child_fk_cols))]
        renames = dict(zip(child_fk_cols, jk_names))

        if rel.type == ONE_TO_MANY:
            return self._aggregate_many(
                node, nid, df, fields, keys_cols, child_fk_cols, jk_names
            )

        # one_to_one: direct left join, payload = struct or bare scalar
        payload_name = f"__p_{nid}"
        if rel.variant == SCALAR and len(specs) == 1 and not node.children:
            payload = fields[0][1]
        else:
            payload = F.struct(*[c.alias(lbl) for lbl, c in fields])
        sel = [F.col(c).alias(renames[c]) for c in child_fk_cols]
        sel.append(payload.alias(payload_name))
        out_keys: dict[tuple[str, str], str] = {}
        for (tbl, pk), colname in keys_cols.items():
            sel.append(F.col(colname))
            out_keys[(tbl, pk)] = colname
        return NodePlan(df.select(*sel), jk_names, payload_name, out_keys)

    def _node_body(
        self, node: Node, extra: set[str]
    ) -> tuple[DataFrame, list[ColumnSpec], list[tuple[str, Column]], dict]:
        """This node's scan joined with all of ITS children (post-order),
        own key lineage attached. Returns (df, specs, payload fields,
        keys_cols)."""
        # columns children need from us (their parent-side FK cols)
        child_extra: set[str] = set()
        child_plans: list[tuple[Node, object, list[str]]] = []
        for ch in node.children:
            if ch.relationship.through_tables:
                through = ch.relationship.through_tables[0]
                fk = self._through_parent_fk(node, through, ch)
                parent_cols = list(fk.parent)
            elif ch.table == node.table:
                # self-join: the reference OR-combines the onclause
                # (ref: pgsync/querybuilder.py:575-577); a single pair is
                # equivalent to AND and takes the generic path
                from ..catalog import self_join_pairs
                from ..node import ForeignKey

                pairs = self_join_pairs(self.catalog.tables, node, ch)
                if len(pairs) == 1:
                    fk = ForeignKey(parent=(pairs[0][0],), child=(pairs[0][1],))
                    parent_cols = [pairs[0][0]]
                else:
                    fk = pairs  # list marker → OR-join decomposition
                    parent_cols = [p for p, _ in pairs]
                child_extra.update(self.catalog.primary_key(node.table, node))
            else:
                fk = self.catalog.resolve_fk(node, ch)
                parent_cols = list(fk.parent)
            child_extra.update(parent_cols)
            child_plans.append((ch, fk, parent_cols))

        # own key lineage: one single-element array per PK column —
        # attached in the base scan's own select (each DataFrame op is
        # an eager JVM analysis pass; a withColumn chain paid one per
        # key and a separate select one more)
        keys_cols: dict[tuple[str, str], str] = {}
        pks = self.catalog.primary_key(node.table, node)
        key_exprs: list[Column] = []
        for pk in pks:
            kname = f"__k_{node.table}__{pk}__{next(self._ids)}"
            key_exprs.append(F.array(F.col(pk)).alias(kname))
            keys_cols[(node.table, pk)] = kname
        if len(pks) > 1:
            # composite-pk tuple key ("pk1|pk2" → "v1|v2"), built at ROW
            # level so values stay paired. The lineage index matches old
            # images against this single entry — per-column matching
            # would be a massive superset (every doc sharing ONE pk
            # component, e.g. all docs with a linenumber-1 lineitem).
            # Excluded from _meta (reference parity) by plans/docs.py.
            kname = f"__k_{node.table}__tuple__{next(self._ids)}"
            key_exprs.append(
                F.array(
                    F.concat_ws("|", *[F.col(p).cast("string") for p in pks])
                ).alias(kname)
            )
            keys_cols[(node.table, "|".join(pks))] = kname

        df, specs = self._base_df(
            node, extra | child_extra, extra_exprs=tuple(key_exprs)
        )
        if node.parent is None and self.root_keys is not None:
            from ..operators.joins import maybe_broadcast

            pks = list(self.catalog.primary_key(node.table, node))
            keys = self.root_keys.toDF(*pks).dropDuplicates()
            df = df.join(
                maybe_broadcast(keys, known_rows=self.root_keys_rows),
                on=pks,
                how="left_semi",
            )
        if node.parent is None and self.root_filters:
            from ..operators.filters import build_filters

            df = df.filter(build_filters(self.root_filters, dict(df.dtypes)))
        fields = self._payload_fields(node, specs)

        # join each child's plan
        for ch, fk, parent_cols in child_plans:
            if isinstance(fk, list):  # multi-pair self-join (OR rule)
                plan = self._self_or_child_plan(ch, node, df, fk)
                parent_cols = list(pks)
            else:
                plan = self._child_plan(ch, node)
            cond = None
            for pc, jk in zip(parent_cols, plan.join_keys):
                c = df[pc] == plan.df[jk]
                cond = c if cond is None else (cond & c)
            # join-key names are globally unique (__jk_<nid>_<i>) and
            # every downstream projection is an explicit column list,
            # so the former .drop(*join_keys) was a pure extra
            # analysis pass — Catalyst prunes the unused columns
            df = df.join(plan.df, cond, "left")
            fields.append((ch.name, F.col(plan.payload)))
            for key, colname in plan.keys_cols.items():
                if key in keys_cols:
                    merged = f"__k_{key[0]}__{key[1]}__{next(self._ids)}"
                    df = df.withColumn(
                        merged,
                        F.concat(
                            F.coalesce(F.col(keys_cols[key]), F.array().cast(df.schema[keys_cols[key]].dataType)),
                            F.coalesce(F.col(colname), F.array().cast(df.schema[colname].dataType)),
                        ),
                    ).drop(keys_cols[key], colname)
                    keys_cols[key] = merged
                else:
                    keys_cols[key] = colname

        fields = apply_node_transforms(node, fields)
        return df, specs, fields, keys_cols

    def _aggregate_many(
        self,
        node: Node,
        nid: int,
        df: DataFrame,
        fields: list[tuple[str, Column]],
        keys_cols: dict,
        group_cols: list[str],
        jk_names: list[str],
        extra_key_collect: dict | None = None,
    ) -> NodePlan:
        """groupBy(fk).agg(sorted collect_list) — the decorrelated form of
        the reference's correlated lateral JSON_AGG subquery."""
        rel = node.relationship
        payload_name = f"__p_{nid}"
        pks = list(self.catalog.primary_key(node.table, node))

        if rel.variant == SCALAR and len(node.columns) == 1 and not node.children:
            value = fields[0][1]
            payload_agg = F.array_sort(F.collect_list(value)).alias(payload_name)
        else:
            # Deterministic ordering: sort elements by their canonical JSON
            # rendering (binary UTF-8 compare — engine-independent). PK order
            # alone is not enough: synthetic data has duplicate child keys.
            # The render happens INSIDE array_sort's comparator, so the
            # aggregation collects (and the groupBy exchange ships) only
            # the struct — the former carried (rendered JSON, struct)
            # pairs, ~2x the shuffle bytes of the payload (guide §2.3),
            # plus a strip pass. Ties (identical renders) are
            # order-unobservable: the document output IS the rendering.
            pstruct = F.struct(*[c.alias(lbl) for lbl, c in fields])
            opts = {"ignoreNullFields": "false"}
            payload_agg = F.array_sort(
                F.collect_list(pstruct),
                lambda x, y: F.when(
                    F.to_json(x, opts) < F.to_json(y, opts), F.lit(-1)
                )
                .when(F.to_json(x, opts) > F.to_json(y, opts), F.lit(1))
                .otherwise(F.lit(0)),
            ).alias(payload_name)

        aggs = [payload_agg]
        out_keys: dict[tuple[str, str], str] = {}
        for key, colname in keys_cols.items():
            merged = f"__k_{key[0]}__{key[1]}__{next(self._ids)}"
            aggs.append(F.flatten(F.collect_list(F.col(colname))).alias(merged))
            out_keys[key] = merged
        for key, col in (extra_key_collect or {}).items():
            merged = f"__k_{key[0]}__{key[1]}__{next(self._ids)}"
            aggs.append(F.collect_list(col).alias(merged))
            out_keys[key] = merged

        grouped = (
            df.groupBy(*[F.col(c).alias(jk) for c, jk in zip(group_cols, jk_names)])
            .agg(*aggs)
        )
        return NodePlan(grouped, jk_names, payload_name, out_keys)

    def _self_or_child_plan(
        self,
        node: Node,
        parent: Node,
        parent_df: DataFrame,
        pairs: list[tuple[str, str]],
    ) -> NodePlan:
        """Self-join child with multiple FK column pairs — the reference
        OR-combines the onclause (ref: pgsync/querybuilder.py:575-577).

        A literal OR join is a nested loop at scale, so the Spark-first
        decomposition is: one equi-join per pair against a slim parent
        key frame, UNION ALL, then dedup on (parent PK, child PK) — a
        child matching through several pairs lands once, exactly the OR
        semantics — and finally the usual grouped aggregation keyed by
        the parent PKs. Every join stays hashable."""
        nid = next(self._ids)
        rel = node.relationship
        ppks = list(self.catalog.primary_key(parent.table, parent))
        cpks = list(self.catalog.primary_key(node.table, node))
        cdf, specs, cfields, ckeys = self._node_body(
            node, extra={c for _, c in pairs} | set(cpks)
        )
        parent_keep = list(dict.fromkeys(ppks + [p for p, _ in pairs]))
        sp = {c: f"__sp_{nid}_{c}" for c in parent_keep}
        P = (
            parent_df.select(*parent_keep)
            .dropDuplicates(ppks)
            .select(*[F.col(c).alias(a) for c, a in sp.items()])
        )
        branches = [
            P.join(cdf, F.col(sp[p]) == cdf[c], "inner") for p, c in pairs
        ]
        E = branches[0]
        for b in branches[1:]:
            E = E.unionByName(b)
        E = E.dropDuplicates([sp[k] for k in ppks] + cpks)
        group_cols = [sp[k] for k in ppks]
        jk_names = [f"__jk_{nid}_{i}" for i in range(len(ppks))]
        if rel.type == ONE_TO_MANY:
            return self._aggregate_many(
                node, nid, E, cfields, ckeys, group_cols, jk_names
            )
        # one_to_one: keep per-match rows (multiple OR matches duplicate
        # the parent row — the reference's join does the same)
        payload_name = f"__p_{nid}"
        if rel.variant == SCALAR and len(specs) == 1 and not node.children:
            payload = cfields[0][1]
        else:
            payload = F.struct(*[c.alias(lbl) for lbl, c in cfields])
        sel = [F.col(g).alias(jk) for g, jk in zip(group_cols, jk_names)]
        sel.append(payload.alias(payload_name))
        out_keys: dict[tuple[str, str], str] = {}
        for key, colname in ckeys.items():
            sel.append(F.col(colname))
            out_keys[key] = colname
        return NodePlan(E.select(*sel), jk_names, payload_name, out_keys)

    def _prefilter_child(
        self,
        df: DataFrame,
        child_cols: list[str],
        parent_cols: list[str],
        parent: Node,
    ) -> DataFrame:
        """Key pushdown into child scans during restricted recompute.

        When compiling with ``root_keys`` (the incremental engine's
        recompute-by-key path), a direct child of the root whose join
        parent columns are root PKs can be pre-filtered: the child rows
        joinable to the restricted roots are exactly those whose FK
        values appear in the projected key set. Without this, a
        4k-root recompute still aggregates the WHOLE child table (the
        groupBy runs below the root join); with it, the semi-join
        reaches the child's parquet/snapshot scan. Safe for any
        parent-col subset of the PKs — projection of the key set can
        only over-approximate, and extra rows fall out at the join."""
        if self.root_keys is None or parent.parent is not None:
            return df
        pks = list(self.catalog.primary_key(parent.table, parent))
        if not set(parent_cols).issubset(set(pks)):
            return df
        from ..operators.joins import maybe_broadcast

        keys = self.root_keys.toDF(*pks)
        keys = keys.select(
            *[F.col(p).alias(c) for c, p in zip(child_cols, parent_cols)]
        ).dropDuplicates()
        return df.join(
            maybe_broadcast(keys, known_rows=self.root_keys_rows),
            on=list(child_cols),
            how="left_semi",
        )

    # ------------------------------------------------------------------
    def _through_parent_fk(self, parent: Node, through: str, node: Node):
        """FK pairs parent↔through (parent side of the two-hop m2m)."""
        return self.catalog.foreign_key(parent.table, through)

    def _through_plan(self, node: Node, parent: Node, nid: int) -> NodePlan:
        """Many-to-many via a through table (ref: pgsync/querybuilder.py:584-841).

        Spark shape: node subplan ⋈ through on node-side FK, then
        groupBy(through.parent_fk).agg(collect_list(...)); through PKs
        are collected into the lineage (ref: querybuilder.py:764-783).
        """
        through = node.relationship.through_tables[0]
        fk_parent = self.catalog.foreign_key(parent.table, through)  # parent ↔ through
        fk_child = self.catalog.foreign_key(node.table, through)  # node ↔ through

        ndf, specs, fields, keys_cols = self._node_body(node, extra=set(fk_child.parent))

        tneeded = set(fk_parent.child) | set(fk_child.child)
        tpks = self.catalog.primary_key(through)
        tneeded.update(tpks)
        tdf = self.catalog.df(through).select(*sorted(tneeded))
        tdf = self._prefilter_child(
            tdf, list(fk_parent.child), list(fk_parent.parent), parent
        )
        talias = f"__t_{nid}"
        tdf = tdf.select(
            *[F.col(c).alias(f"{talias}_{c}") for c in sorted(tneeded)]
        )

        cond = None
        for nc, tc in zip(fk_child.parent, fk_child.child):
            c = ndf[nc] == tdf[f"{talias}_{tc}"]
            cond = c if cond is None else (cond & c)
        joined = tdf.join(ndf, cond, "inner")

        group_cols = [f"{talias}_{c}" for c in fk_parent.child]
        jk_names = [f"__jk_{nid}_{i}" for i in range(len(group_cols))]
        extra_keys = {
            (through, pk): F.col(f"{talias}_{pk}") for pk in tpks
        }
        if len(tpks) > 1:
            extra_keys[(through, "|".join(tpks))] = F.concat_ws(
                "|", *[F.col(f"{talias}_{pk}").cast("string") for pk in tpks]
            )
        return self._aggregate_many(
            node, nid, joined, fields, keys_cols, group_cols, jk_names,
            extra_key_collect=extra_keys,
        )

    # ------------------------------------------------------------------
    def _root(self, tree: Tree) -> CompiledDoc:
        node = tree.root
        df, specs, fields, keys_cols = self._node_body(node, extra=set())
        pks = list(self.catalog.primary_key(node.table, node))

        sel: list[Column] = [F.col(pk) for pk in pks]
        field_names: list[str] = []
        field_is_array: dict[str, bool] = {}
        for lbl, col in fields:
            sel.append(col.alias(f"__f_{lbl}"))
            field_names.append(lbl)
        for key, colname in keys_cols.items():
            sel.append(F.col(colname))
        out = df.select(*sel)
        for ch in node.children:
            if ch.relationship.type == ONE_TO_MANY:
                field_is_array[ch.name] = True
        return CompiledDoc(
            df=out,
            tree=tree,
            root_pks=pks,
            field_names=field_names,
            keys_cols=dict(keys_cols),
            field_is_array=field_is_array,
        )
