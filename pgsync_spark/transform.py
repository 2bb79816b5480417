"""Plan-time column transforms: replace → rename → concat.

The reference applies these per fetched row in the driver process
(ref: pgsync/transform.py:211-216, order documented README.md:249).
Spark-first: they compile into Column expressions at plan time, so they
run JVM-side inside whole-stage codegen instead of per-row Python.

Semantics parity:
- ``replace``: substring find/replace on string fields
  (ref: pgsync/transform.py:114-209).
- ``rename``: output field rename (ref: pgsync/transform.py:18-64).
- ``concat``: join column values with a delimiter into a new field,
  dropping falsy values (None, '', 0, false) exactly like the
  reference's ``filter(None, ...)`` (ref: pgsync/transform.py:66-112,
  98-100).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .node import Node


def _drop_falsy(col: Column) -> Column:
    """NULL out falsy values so concat_ws skips them (reference
    ``filter(None, values)`` parity, pgsync/transform.py:98-100)."""
    s = col.cast("string")
    return F.when(
        col.isNull()
        | (s == "")
        | (s == "0")
        | (s == "0.0")
        | (s == "false"),
        F.lit(None).cast("string"),
    ).otherwise(s)


def apply_node_transforms(
    node: Node, fields: list[tuple[str, Column]]
) -> list[tuple[str, Column]]:
    """Apply this node's transform block to its (label, column) fields."""
    spec = node.transform or {}
    if not spec:
        return fields

    out = list(fields)

    replace = spec.get("replace") or {}
    if replace:
        out2 = []
        for lbl, col in out:
            if lbl in replace:
                for old, new in replace[lbl].items():
                    col = F.replace(col.cast("string"), F.lit(old), F.lit(new))
            out2.append((lbl, col))
        out = out2

    rename = spec.get("rename") or {}
    if rename:
        out = [(rename.get(lbl, lbl), col) for lbl, col in out]

    concat = spec.get("concat") or {}
    if concat:
        specs = concat if isinstance(concat, list) else [concat]
        by_label = dict(out)
        for c in specs:
            cols = c.get("columns", [])
            dest = c.get("destination")
            delim = c.get("delimiter", "")
            parts = [
                _drop_falsy(by_label[name]) if name in by_label else F.lit(str(name))
                for name in cols
            ]
            out.append((dest, F.concat_ws(delim, *parts)))
    return out
