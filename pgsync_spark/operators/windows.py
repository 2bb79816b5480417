"""Window helpers shared by the topk serving paths."""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql.window import WindowSpec


def bounded_rank_window(*order: Column | str) -> WindowSpec:
    """A global rank window for a frame ALREADY bounded to <= k rows
    (every caller ranks the survivors of an `.orderBy(...).limit(k)`
    TakeOrderedAndProject, so the window sees at most k rows — the
    single partition is the design, not an accident; r11 verdict
    item 4).

    Spark's WindowExec warns "No Partition Defined for Window" on
    every such query, and partitioning by a literal does NOT silence
    it (the optimizer strips foldable expressions from the partition
    spec before WindowExec sees it — verified on 4.1). So the
    discipline is inverted: every global-ORDER window in the package
    MUST come through this audited chokepoint (statically enforced by
    tests/test_queries.py::test_global_windows_use_bounded_chokepoint),
    and get_spark() drops the WindowExec logger to ERROR — the
    warning can no longer flag a real unbounded window here because
    the chokepoint test flags it first, at review time instead of in
    a log stream."""
    return Window.orderBy(*order)
