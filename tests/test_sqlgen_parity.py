"""Pinned parity: the one-SQL compiler (plans/sqlgen.py) must produce
the IDENTICAL Catalyst tree — and therefore byte-identical documents —
as the TreeCompiler + assemble_docs path it replaces on the hot paths
(per-batch engine recompute, full sync, denorm queries).

The pin is optimized-plan ``sameResult`` (canonical plan equality —
dropDuplicates/DISTINCT and Project stacking normalize there, names
and exprIds are erased) PLUS byte-equality of collected rows, for
every registered topology and for the engine-shaped variants
(root-keys restricted compile, include_pks/include_keys combined
frame, root filters).
"""

import pytest
from pyspark.sql import functions as F

from pgsync_spark import Catalog, schemas
from pgsync_spark.plans.compiler import TreeCompiler
from pgsync_spark.plans.docs import assemble_docs
from pgsync_spark.plans.sqlgen import (
    SqlgenUnsupported,
    SqlTreeCompiler,
    compile_assembled,
    sql_expressible,
)

from conftest import SF_DIR


def _same_optimized(a, b) -> bool:
    return (
        a._jdf.queryExecution()
        .optimizedPlan()
        .sameResult(b._jdf.queryExecution().optimizedPlan())
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", schemas.tree_names())
def test_sqlgen_matches_treecompiler(spark, name):
    cat = Catalog(spark, SF_DIR)
    tree = schemas.tree(name)
    compiled = TreeCompiler(cat).compile(tree)
    old = assemble_docs(compiled)
    new, meta = compile_assembled(cat, tree)
    if sql_expressible(cat, tree):
        assert _same_optimized(old, new), name
        # metadata inventory (names included — the engine's lineage
        # consumers address key arrays by these)
        assert meta.keys_cols == compiled.keys_cols
        assert meta.field_names == compiled.field_names
        assert meta.root_pks == compiled.root_pks
        assert meta.field_is_array == compiled.field_is_array
    assert _rows(old) == _rows(new), name


@pytest.mark.parametrize(
    "name",
    ["orders_full", "supplier_parts_through", "lineitem_composite_root",
     "customer_orders_lineitems"],
)
def test_sqlgen_root_keys_combined_frame(spark, name):
    """The engine's per-batch shape: restricted recompute with typed
    root keys riding along plus lineage key arrays (include_pks +
    include_keys)."""
    cat = Catalog(spark, SF_DIR)
    tree = schemas.tree(name)
    pks = list(cat.primary_key(tree.root.table, tree.root))
    keys = cat.df(tree.root.table).select(*pks).limit(7)
    keys = keys.localCheckpoint(eager=True)
    try:
        compiled = TreeCompiler(cat, root_keys=keys, root_keys_rows=7).compile(
            tree
        )
        old = assemble_docs(compiled, include_pks=True, include_keys=True)
        new, meta = compile_assembled(
            cat, tree, root_keys=keys, root_keys_rows=7,
            include_pks=True, include_keys=True,
        )
        assert old.columns == new.columns
        assert _same_optimized(old, new), name
        assert _rows(old) == _rows(new), name
    finally:
        from pgsync_spark import caching

        caching.release_local_checkpoint(keys)


def test_sqlgen_root_filters(spark):
    from pgsync_spark.queries import _DENORM_FILTERS

    cat = Catalog(spark, SF_DIR)
    tree = schemas.tree("orders_lineitems")
    old = assemble_docs(
        TreeCompiler(cat, root_filters=_DENORM_FILTERS).compile(tree)
    )
    new, _ = compile_assembled(cat, tree, root_filters=_DENORM_FILTERS)
    assert _same_optimized(old, new)
    assert _rows(old) == _rows(new)


def test_sqlgen_broadcast_hint_parity(spark):
    """Hints are erased from canonical plans, so sameResult cannot pin
    them — assert the analyzed plan carries the hint exactly when the
    DataFrame path's maybe_broadcast would apply it."""
    cat = Catalog(spark, SF_DIR)
    tree = schemas.tree("orders_lineitems")
    pks = list(cat.primary_key(tree.root.table, tree.root))
    keys = cat.df(tree.root.table).select(*pks).limit(3)

    small, _ = compile_assembled(cat, tree, root_keys=keys, root_keys_rows=3)
    assert "UnresolvedHint" not in small._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in small._jdf.queryExecution().analyzed().toString()

    big, _ = compile_assembled(
        cat, tree, root_keys=keys, root_keys_rows=10**7
    )
    assert "ResolvedHint" not in big._jdf.queryExecution().analyzed().toString()


def test_sqlgen_unsupported_falls_back(spark):
    """nation_related's multi-pair self-join has no one-SQL form; the
    facade must fall back to TreeCompiler and still answer."""
    cat = Catalog(spark, SF_DIR)
    tree = schemas.tree("nation_related")
    assert not sql_expressible(cat, tree)
    with pytest.raises(SqlgenUnsupported):
        SqlTreeCompiler(cat, {t: t for t in tree.tables()}).compile(tree)
    old = assemble_docs(TreeCompiler(cat).compile(tree))
    new, _ = compile_assembled(cat, tree)
    assert _rows(old) == _rows(new)


def test_filters_to_spark_sql_matches_build_filters(spark):
    """filters_to_spark_sql must parse to the identical predicate tree
    as build_filters, across every _typed_eq branch (mixed-type guards,
    try_cast, null-safe equality, AND/OR shape)."""
    from pgsync_spark.operators.filters import (
        build_filters,
        filters_to_spark_sql,
    )

    df = spark.range(3).selectExpr(
        "id AS i",
        "CAST(id AS DOUBLE) AS d",
        "CAST(id AS STRING) AS s",
        "id % 2 = 0 AS b",
        "CAST(id AS DECIMAL(12,2)) AS dec",
        "TIMESTAMP '2024-01-01 00:00:00' AS ts",
    )
    dtypes = dict(df.dtypes)
    cases = [
        [{"i": 1}],
        [{"i": 2**40}],
        [{"d": 0.5}],
        [{"s": "x'y\\z"}],
        [{"s": 7}],              # stringy col vs number → FALSE
        [{"i": "7"}],            # numeric col vs string → try_cast
        [{"i": "not-a-number"}],
        [{"dec": "1.5"}],
        [{"ts": "2024-01-01 00:00:00"}],
        [{"b": True}, {"b": "true"}],
        [{"i": True}],           # bool vs non-bool col → FALSE
        [{"b": 3}],              # bool col vs number → FALSE
        [{"i": None}],
        [{"i": 1, "s": "a"}, {"d": 2.5}],   # AND within, OR across
        [],
    ]
    for clauses in cases:
        a = df.filter(build_filters(clauses, dtypes))
        b = df.filter(F.expr(filters_to_spark_sql(clauses, dtypes)))
        assert (
            a._jdf.queryExecution()
            .analyzed()
            .sameResult(b._jdf.queryExecution().analyzed())
        ), clauses


def test_filters_spark_sql_nonfinite_literals(spark):
    """inf/nan filter values must render as parseable SQL (the former
    'infD'/'nanD' were parse errors) that constant-folds to the SAME
    Literal the Column path's F.lit produces — optimized-plan
    sameResult, r14 ADVICE item."""
    from pgsync_spark.operators.filters import (
        build_filters,
        filters_to_spark_sql,
    )

    df = spark.range(3).selectExpr("CAST(id AS DOUBLE) AS d")
    dtypes = dict(df.dtypes)
    for v in (float("inf"), float("-inf"), float("nan")):
        clauses = [{"d": v}]
        a = df.filter(build_filters(clauses, dtypes))
        b = df.filter(F.expr(filters_to_spark_sql(clauses, dtypes)))
        assert (
            a._jdf.queryExecution()
            .optimizedPlan()
            .sameResult(b._jdf.queryExecution().optimizedPlan())
        ), v
        assert a.count() == b.count() == 0


def test_filters_out_of_bigint_falls_back(spark):
    """An int filter value outside bigint range has no SQL literal
    form (and F.lit rejects it too) — sql_renderable_filters must
    flag it so compile_assembled routes through TreeCompiler instead
    of emitting an unparseable 'L' literal; _spark_sql_lit raises the
    typed error."""
    import pytest as _pytest

    from pgsync_spark.operators.filters import (
        UnrenderableLiteral,
        _spark_sql_lit,
        sql_renderable_filters,
    )

    assert sql_renderable_filters([{"o_orderkey": 2**62}])
    assert not sql_renderable_filters([{"o_orderkey": 2**63 + 5}])
    assert sql_renderable_filters(None)
    with _pytest.raises(UnrenderableLiteral):
        _spark_sql_lit(2**63 + 5)


def test_view_scope_reuses_unchanged_frames(spark):
    """ViewScope must re-register a table's view only when the frame
    object changes, and release() must drop everything it created."""
    from pgsync_spark.plans.sqlgen import ViewScope

    cat = Catalog(spark, SF_DIR)
    scope = ViewScope(spark)
    df = cat.df("orders")
    v1 = scope.view_for("orders", df)
    assert spark.catalog.tableExists(v1)
    assert scope.view_for("orders", df) == v1
    other = df.limit(1)
    assert scope.view_for("orders", other) == v1  # same name, new plan
    assert spark.table(v1).count() == 1
    scope.release()
    assert not spark.catalog.tableExists(v1)


def test_full_sync_memo_reexecutes(spark):
    """The full_sync compile memo reuses the PLAN only: each sync must
    materialize a fresh checkpoint (a reused Dataset would replay the
    first sync's blocks — result caching — and break once those blocks
    are released by store teardown)."""
    from pgsync_spark.streaming.incremental import IncrementalEngine

    cat = Catalog(spark, SF_DIR)
    eng = IncrementalEngine(spark, schemas.tree("orders_lineitems"), cat)
    eng.full_sync()
    first_rdd = eng._shared_base.rdd.id()
    n1 = eng.docs.count()
    eng.full_sync()  # memo hit (catalog unchanged) — must re-execute
    assert eng._shared_base.rdd.id() != first_rdd
    assert eng.docs.count() == n1
    eng.full_sync()  # third sync crosses a released shared base
    assert eng.docs.count() == n1
    eng._teardown_stores()


def test_engine_batch_uses_sqlgen_and_matches(spark):
    """End-to-end engine smoke: a CDC batch processed through the
    one-SQL recompute leaves the doc store byte-identical to a fresh
    full re-denormalization of the post-batch snapshots."""
    import pyspark.sql.types as T

    from pgsync_spark.streaming.incremental import IncrementalEngine

    cat = Catalog(spark, SF_DIR)
    tree = schemas.tree("orders_lineitems")
    eng = IncrementalEngine(spark, tree, cat)
    eng.full_sync()

    schema = T.StructType(
        [
            T.StructField("table", T.StringType()),
            T.StructField("schema", T.StringType()),
            T.StructField("op", T.StringType()),
            T.StructField("txid", T.LongType()),
            T.StructField("old", T.MapType(T.StringType(), T.StringType())),
            T.StructField("new", T.MapType(T.StringType(), T.StringType())),
        ]
    )
    events = spark.createDataFrame(
        [
            ("orders", "public", "update", 1,
             {"o_orderkey": "1"},
             {"o_orderkey": "1", "o_orderstatus": "Z", "o_totalprice": "9.5"}),
            ("lineitem", "public", "delete", 2,
             {"l_orderkey": "2", "l_linenumber": "1"}, None),
        ],
        schema,
    )
    eng.process_batch(events)

    fresh, meta = compile_assembled(
        cat, tree, include_pks=True, include_keys=True
    )
    doc_cols = [c for c in fresh.columns if not c.startswith("__k_")]
    expect = _rows(fresh.select(*doc_cols))
    got = _rows(eng.docs)
    assert got == expect
