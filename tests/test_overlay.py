"""KeyedOverlay unit tests: apply/compact/reset semantics, including
multi-row-per-key stores (the lineage shape)."""

from pyspark.sql import functions as F

from pgsync_spark.operators.overlay import KeyedOverlay


def _df(spark, rows, schema="k long, v string"):
    return spark.createDataFrame(rows, schema)


def _rows(ov):
    return {(r["k"], r["v"]) for r in ov.view().collect()}


def test_apply_replaces_and_deletes(spark):
    ov = KeyedOverlay(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), ["k"])
    # replace k=1, delete k=2 (touched, no rows), insert k=9
    ov.apply(
        _df(spark, [(1,), (2,)], "k long"),
        _df(spark, [(1, "a2"), (9, "new")]),
        key_bound=3,
    )
    assert _rows(ov) == {(1, "a2"), (3, "c"), (9, "new")}
    # second apply: update the overlay-resident new key
    ov.apply(
        _df(spark, [(9,)], "k long"),
        _df(spark, [(9, "new2")]),
        key_bound=1,
    )
    assert _rows(ov) == {(1, "a2"), (3, "c"), (9, "new2")}


def test_multi_row_per_key(spark):
    base = _df(spark, [(1, "x"), (1, "y"), (2, "z")])
    ov = KeyedOverlay(base, ["k"])
    ov.apply(
        _df(spark, [(1,)], "k long"),
        _df(spark, [(1, "p"), (1, "q"), (1, "r")]),
        key_bound=1,
    )
    assert _rows(ov) == {(1, "p"), (1, "q"), (1, "r"), (2, "z")}


def test_compact_cadence_and_generation(spark):
    ov = KeyedOverlay(_df(spark, [(1, "a")]), ["k"], compact_every=2)
    ov.apply(_df(spark, [(1,)], "k long"), _df(spark, [(1, "b")]), key_bound=1)
    assert ov.generation == 0 and ov.keys is not None
    ov.apply(_df(spark, [(1,)], "k long"), _df(spark, [(1, "c")]), key_bound=1)
    # second apply hit the cadence: folded into a fresh base
    assert ov.generation == 1 and ov.keys is None
    assert _rows(ov) == {(1, "c")}


def test_key_bound_threshold_compacts(spark):
    ov = KeyedOverlay(
        _df(spark, [(1, "a")]), ["k"], compact_every=100, row_cap=2
    )
    # cumulative key bound must exceed max(4*batch_bound, row_cap)=4,
    # so the 5th single-key apply triggers the size compaction
    for i in range(5):
        ov.apply(
            _df(spark, [(1,)], "k long"),
            _df(spark, [(1, f"v{i}")]),
            key_bound=1,
        )
    assert ov.generation >= 1
    assert _rows(ov) == {(1, "v4")}


def test_view_identity_stable_between_changes(spark):
    ov = KeyedOverlay(_df(spark, [(1, "a")]), ["k"])
    assert ov.view() is ov.view()
    ov.apply(_df(spark, [(1,)], "k long"), _df(spark, [(1, "b")]), key_bound=1)
    v = ov.view()
    assert v is ov.view()


def test_reset_swaps_base(spark):
    ov = KeyedOverlay(_df(spark, [(1, "a")]), ["k"])
    ov.apply(_df(spark, [(2,)], "k long"), _df(spark, [(2, "b")]), key_bound=1)
    ov.reset(_df(spark, [(7, "z")]))
    assert _rows(ov) == {(7, "z")}
    assert ov.keys is None and ov.generation >= 1
