"""Physical-layout advisor — the Spark analog of the reference's
``Sync.analyze`` (ref: pgsync/sync.py:276-324).

The reference walks every non-root node and reports whether the child
side of each join has a supporting index, printing a CREATE INDEX
statement when not. On Spark there are no indexes; the equivalent
levers for the same joins are broadcast thresholds, bucketing
(co-located shuffle-free joins), and skew handling. ``analyze`` walks
the tree the same way and reports, per join edge:

- the join key columns on both sides (what the reference indexes),
- measured sizes (row counts; skew ratio of the hottest key), and
- a recommendation: BROADCAST small dimensions, BUCKET big-big joins
  on the child FK (``bucketBy`` DDL emitted like the reference's
  CREATE INDEX), SALT-or-AQE when the key distribution is skewed.

Driver-side counts are deliberate: this is an offline advisory tool,
run once per schema like the reference's ``analyze`` command.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import functions as F

from .catalog import Catalog, self_join_pairs
from .node import Node, Tree

BROADCAST_MAX_ROWS = 1_000_000  # ~dimension-table scale for slim rows
SKEW_RATIO = 8.0  # hottest key vs average → salting advice
N_BUCKETS = 256


@dataclass
class Advice:
    child_table: str
    parent_table: str
    join_keys: list[str]  # child-side columns (what the reference indexes)
    child_rows: int
    parent_rows: int
    skew_ratio: float
    recommendation: str
    ddl: str | None = None

    def render(self) -> str:
        base = (
            f"join {self.parent_table} ⟕ {self.child_table} on "
            f"{self.join_keys}: child={self.child_rows} rows, "
            f"parent={self.parent_rows} rows, skew={self.skew_ratio:.1f}x"
            f" → {self.recommendation}"
        )
        if self.ddl:
            base += f"\n  apply with: {self.ddl}"
        return base


def _key_skew(df, keys: list[str]) -> float:
    """max key-group size / mean key-group size (1.0 = uniform)."""
    stats = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"), F.avg("n").alias("avg"))
        .collect()[0]
    )
    if not stats["avg"]:
        return 1.0
    return float(stats["mx"]) / float(stats["avg"])


def analyze(catalog: Catalog, tree: Tree) -> list[Advice]:
    """Walk every join edge breadth-first (like the reference) and
    produce layout advice."""
    out: list[Advice] = []
    for node in tree.root.traverse_breadth_first():
        if node.parent is None:
            continue
        edges: list[tuple[str, str, list[str]]] = []
        if node.relationship.through_tables:
            through = node.relationship.through_tables[0]
            fk_p = catalog.foreign_key(node.parent.table, through)
            fk_c = catalog.foreign_key(node.table, through)
            edges.append((node.parent.table, through, list(fk_p.child)))
            edges.append((through, node.table, list(fk_c.parent)))
        elif node.table == node.parent.table:
            pairs = self_join_pairs(catalog.tables, node.parent, node)
            edges.append(
                (node.parent.table, node.table, [c for _, c in pairs])
            )
        else:
            fk = catalog.resolve_fk(node.parent, node)
            edges.append((node.parent.table, node.table, list(fk.child)))
        for parent_table, child_table, keys in edges:
            child_df = catalog.df(child_table)
            child_rows = child_df.count()
            parent_rows = catalog.df(parent_table).count()
            skew = _key_skew(child_df, keys)
            ddl = None
            if child_rows <= BROADCAST_MAX_ROWS:
                rec = (
                    "BROADCAST the child side (fits the driver comfortably; "
                    "no shuffle)"
                )
            elif skew >= SKEW_RATIO:
                rec = (
                    f"SKEWED key (hottest {skew:.0f}x average): enable AQE "
                    "skew-join or salt the key"
                )
            else:
                rec = (
                    "BUCKET both sides on the join key for a shuffle-free "
                    "sort-merge join"
                )
                cols = ", ".join(keys)
                ddl = (
                    f"df.write.bucketBy({N_BUCKETS}, {cols!r})"
                    f".sortBy({cols!r}).saveAsTable({child_table!r})"
                )
            out.append(
                Advice(
                    child_table=child_table,
                    parent_table=parent_table,
                    join_keys=keys,
                    child_rows=child_rows,
                    parent_rows=parent_rows,
                    skew_ratio=skew,
                    recommendation=rec,
                    ddl=ddl,
                )
            )
    return out


def analyze_report(catalog: Catalog, tree: Tree) -> str:
    return "\n".join(a.render() for a in analyze(catalog, tree))
