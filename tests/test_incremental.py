"""Incremental engine e2e: apply CDC event batches, assert the
incrementally-maintained doc store equals a full recompute from the
final table state (the reference's golden-delta + assert_resync_empty
strategy, ref tests/test_sync_nested_children.py mutations +
tests/testing_utils.py:41-67)."""

import pytest

from pyspark.sql import functions as F

from pgsync_spark import Catalog, TreeCompiler, schemas
from pgsync_spark.streaming import IncrementalEngine, payloads_from_rows

from conftest import SF_DIR


def _docs_equal(a, b):
    return (
        a.select("_id", "doc").subtract(b.select("_id", "doc")).count() == 0
        and b.select("_id", "doc").subtract(a.select("_id", "doc")).count() == 0
    )


def _full_recompute(spark, engine, tree):
    return TreeCompiler(engine.catalog).compile_docs(tree)


@pytest.fixture()
def engine(spark):
    tree = schemas.tree("orders_full")
    eng = IncrementalEngine(spark, tree, Catalog(spark, SF_DIR))
    eng.full_sync()
    return eng


def _order_row(catalog, key):
    r = catalog.df("orders").filter(F.col("o_orderkey") == key).collect()[0]
    return {k: r[k] for k in r.asDict()}


def test_root_update(spark, engine):
    row = _order_row(engine.catalog, 7)
    new = dict(row, o_orderpriority="9-INCREMENTAL")
    ev = payloads_from_rows(
        spark,
        [{"op": "UPDATE", "table": "orders", "old": {"o_orderkey": 7}, "new": new, "txid": 1}],
    )
    engine.process_batch(ev)
    assert _docs_equal(
        engine.docs, _full_recompute(spark, engine, schemas.tree("orders_full"))
    )
    doc = engine.docs.filter(F.col("_id") == "7").collect()[0]["doc"]
    assert "9-INCREMENTAL" in doc


def test_root_insert_and_delete(spark, engine):
    row = _order_row(engine.catalog, 3)
    new = dict(row, o_orderkey=999999)
    ev = payloads_from_rows(
        spark,
        [
            {"op": "INSERT", "table": "orders", "new": new, "txid": 2},
            {"op": "DELETE", "table": "orders", "old": {"o_orderkey": 5}, "txid": 3},
        ],
    )
    n_before = engine.docs.count()
    engine.process_batch(ev)
    assert engine.docs.count() == n_before  # +1 insert -1 delete
    assert engine.docs.filter(F.col("_id") == "999999").count() == 1
    assert engine.docs.filter(F.col("_id") == "5").count() == 0
    assert _docs_equal(
        engine.docs, _full_recompute(spark, engine, schemas.tree("orders_full"))
    )


def test_root_pk_change_deletes_old_doc(spark, engine):
    """ref: pgsync/sync.py:1194-1225 — root PK update must remove the old
    doc id and index the new one."""
    row = _order_row(engine.catalog, 11)
    new = dict(row, o_orderkey=888888)
    ev = payloads_from_rows(
        spark,
        [{"op": "UPDATE", "table": "orders", "old": {"o_orderkey": 11}, "new": new, "txid": 4}],
    )
    engine.process_batch(ev)
    assert engine.docs.filter(F.col("_id") == "11").count() == 0
    assert engine.docs.filter(F.col("_id") == "888888").count() == 1
    assert _docs_equal(
        engine.docs, _full_recompute(spark, engine, schemas.tree("orders_full"))
    )


def test_child_insert_updates_parent_doc(spark, engine):
    """New lineitem must re-materialize its order's doc (non-root event,
    new-image FK resolution)."""
    ev = payloads_from_rows(
        spark,
        [
            {
                "op": "INSERT",
                "table": "lineitem",
                "new": {
                    "l_orderkey": 2,
                    "l_partkey": 1,
                    "l_suppkey": 1,
                    "l_linenumber": 99,
                    "l_quantity": 1.0,
                    "l_extendedprice": 42.5,
                    "l_discount": 0.0,
                    "l_tax": 0.0,
                    "l_returnflag": "Z",
                    "l_linestatus": "Z",
                    "l_shipdate": "2025-01-01 00:00:00",
                },
                "txid": 5,
            }
        ],
    )
    engine.process_batch(ev)
    doc = engine.docs.filter(F.col("_id") == "2").collect()[0]["doc"]
    assert '"l_linenumber":99' in doc
    assert _docs_equal(
        engine.docs, _full_recompute(spark, engine, schemas.tree("orders_full"))
    )


def test_deep_child_update_propagates(spark, engine):
    """A nation rename must update every order doc whose customer lives
    there (ref: tests/test_sync_nested_children.py:1819 country rename)."""
    ev = payloads_from_rows(
        spark,
        [
            {
                "op": "UPDATE",
                "table": "nation",
                "old": {"n_nationkey": 9},
                "new": {"n_nationkey": 9, "n_name": "RENAMED_NATION", "n_regionkey": 2},
                "txid": 6,
            }
        ],
    )
    engine.process_batch(ev)
    hits = engine.docs.filter(F.col("doc").contains("RENAMED_NATION")).count()
    assert hits > 0
    assert _docs_equal(
        engine.docs, _full_recompute(spark, engine, schemas.tree("orders_full"))
    )


def test_event_on_table_not_in_tree_is_noop(spark, engine):
    """ref: tests/test_sync_nested_children.py:2114-2239."""
    before = engine.docs
    ev = payloads_from_rows(
        spark,
        [{"op": "UPDATE", "table": "part", "old": {"p_partkey": 1}, "new": {"p_partkey": 1, "p_name": "x"}, "txid": 7}],
    )
    engine.process_batch(ev)
    assert engine.docs is before


def test_child_truncate(spark, engine):
    ev = payloads_from_rows(spark, [{"op": "TRUNCATE", "table": "lineitem", "txid": 8}])
    engine.process_batch(ev)
    assert engine.docs.filter(F.col("doc").contains('"lineitems":[')).count() == 0
    assert _docs_equal(
        engine.docs, _full_recompute(spark, engine, schemas.tree("orders_full"))
    )


def test_root_truncate(spark, engine):
    ev = payloads_from_rows(spark, [{"op": "TRUNCATE", "table": "orders", "txid": 9}])
    engine.process_batch(ev)
    assert engine.docs.count() == 0


def test_through_table_event(spark):
    """Through-table (lineitem) event on the supplier↔part tree."""
    tree = schemas.tree("supplier_parts_through")
    eng = IncrementalEngine(spark, tree, Catalog(spark, SF_DIR))
    eng.full_sync()
    ev = payloads_from_rows(
        spark,
        [
            {
                "op": "INSERT",
                "table": "lineitem",
                "new": {
                    "l_orderkey": 1,
                    "l_partkey": 3,
                    "l_suppkey": 4,
                    "l_linenumber": 98,
                    "l_quantity": 1.0,
                    "l_extendedprice": 1.0,
                    "l_discount": 0.0,
                    "l_tax": 0.0,
                    "l_returnflag": "Z",
                    "l_linestatus": "Z",
                    "l_shipdate": "2025-01-01 00:00:00",
                },
                "txid": 10,
            }
        ],
    )
    eng.process_batch(ev)
    assert _docs_equal(eng.docs, TreeCompiler(eng.catalog).compile_docs(tree))


def test_mixed_batch_resync_idempotent(spark, engine):
    """Mixed multi-op batch then a second identical-state check: applying
    the same final state full-recompute twice changes nothing
    (assert_resync_empty analog)."""
    row = _order_row(engine.catalog, 20)
    ev = payloads_from_rows(
        spark,
        [
            {"op": "UPDATE", "table": "orders", "old": {"o_orderkey": 20},
             "new": dict(row, o_totalprice=1.5), "txid": 11},
            {"op": "DELETE", "table": "orders", "old": {"o_orderkey": 21}, "txid": 12},
            {"op": "UPDATE", "table": "customer", "old": {"c_custkey": 10},
             "new": {"c_custkey": 10, "c_name": "RENAMED_CUST", "c_nationkey": 3,
                     "c_acctbal": 0.0, "c_mktsegment": "BUILDING"}, "txid": 13},
        ],
    )
    engine.process_batch(ev)
    full = _full_recompute(spark, engine, schemas.tree("orders_full"))
    assert _docs_equal(engine.docs, full)
    # re-processing an empty batch is a no-op
    engine.process_batch(payloads_from_rows(spark, []))
    assert _docs_equal(engine.docs, full)
