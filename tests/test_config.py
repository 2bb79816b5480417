"""Config loader (env templating) + txid window + engine stats."""

import json

import pytest

from pyspark.sql import functions as F

from pgsync_spark import Catalog, exc, schemas
from pgsync_spark.config import config_loader
from pgsync_spark.streaming import IncrementalEngine, payloads_from_rows

from conftest import SF_DIR


def test_config_loader_env_templating(tmp_path, monkeypatch):
    monkeypatch.setenv("ROOT_TABLE", "orders")
    cfg = tmp_path / "schema.json"
    cfg.write_text(
        json.dumps(
            [
                {
                    "index": "${ROOT_TABLE}_idx",
                    "nodes": {
                        "table": "${ROOT_TABLE}",
                        "columns": ["o_orderkey", "${MISSING:-o_orderstatus}"],
                    },
                }
            ]
        )
    )
    trees = config_loader(str(cfg))
    assert len(trees) == 1
    assert trees[0].index == "orders_idx"
    assert trees[0].root.table == "orders"
    assert [c.name for c in trees[0].root.columns] == ["o_orderkey", "o_orderstatus"]


def test_config_loader_missing_env(tmp_path):
    cfg = tmp_path / "schema.json"
    cfg.write_text('{"nodes": {"table": "${NOT_SET_ANYWHERE}"}}')
    with pytest.raises(exc.SchemaError):
        config_loader(str(cfg))


def test_duckdb_connect_quoted_path(tmp_path):
    """ADVICE r5: CLI --validate points duckdb_connect at arbitrary
    user --data-dir values; a path containing a single quote must
    register views instead of breaking the SQL literal."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pgsync_spark.testing import duckdb_connect

    d = tmp_path / "it's data"
    d.mkdir()
    pq.write_table(
        pa.table({"r_regionkey": [0, 1], "r_name": ["A", "B"]}),
        d / "region.parquet",
    )
    # a non-testdata table name exercises the glob branch too
    pq.write_table(pa.table({"x": [7]}), d / "extra.parquet")
    con = duckdb_connect(str(d))
    try:
        assert con.execute("SELECT count(*) FROM region").fetchone()[0] == 2
        assert con.execute("SELECT x FROM extra").fetchone()[0] == 7
    finally:
        con.close()


def test_config_loader_bad_json(tmp_path):
    cfg = tmp_path / "schema.json"
    cfg.write_text("{nope")
    with pytest.raises(exc.SchemaError):
        config_loader(str(cfg))


def test_txid_window_and_checkpoint(spark):
    """Events outside [txmin, txmax) are ignored; checkpoint advances to
    the highest applied txid (ref: pgsync/sync.py:1890-1945)."""
    eng = IncrementalEngine(
        spark, schemas.tree("root_only"), Catalog(spark, SF_DIR)
    )
    eng.full_sync()
    row = (
        eng.catalog.df("orders").filter(F.col("o_orderkey") == 1).collect()[0].asDict()
    )
    events = payloads_from_rows(
        spark,
        [
            {"op": "UPDATE", "table": "orders", "old": {"o_orderkey": 1},
             "new": dict(row, o_orderpriority="IN-WINDOW"), "txid": 5},
            {"op": "DELETE", "table": "orders", "old": {"o_orderkey": 2}, "txid": 99},
        ],
    )
    eng.process_batch(events, txmin=1, txmax=10)
    assert "IN-WINDOW" in eng.docs.filter(F.col("_id") == "1").collect()[0]["doc"]
    assert eng.docs.filter(F.col("_id") == "2").count() == 1  # txid 99 excluded
    assert eng.checkpoint == 5
    assert eng.stats["batches"] == 1 and eng.stats["events"] == 1
    # replay the same window: idempotent (same doc content), checkpoint same
    eng.process_batch(events, txmin=1, txmax=10)
    assert eng.checkpoint == 5
    assert "IN-WINDOW" in eng.docs.filter(F.col("_id") == "1").collect()[0]["doc"]
