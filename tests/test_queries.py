"""Every registry query hash-matches its oracle at sf0.001 (the driver
does the same at sf0.01) + plan-shape assertions for scale."""

import pytest

from pgsync_spark.queries import REGISTRY
from pgsync_spark.testing import compare

from conftest import SF_DIR


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, name):
    qdef = REGISTRY[name]
    df = qdef.fn(spark, SF_DIR)
    if qdef.oracle is None:
        assert df.count() >= 0
        return
    ok, msg = compare(df, qdef.oracle, SF_DIR)
    assert ok, msg


def test_projection_pushdown_reaches_scan(spark):
    """The parquet scan must carry PushedFilters and a pruned ReadSchema."""
    df = REGISTRY["projection_pushdown"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "LessThan(l_shipdate" in plan


def test_broadcast_join_is_broadcast(spark):
    df = REGISTRY["join_fk_broadcast"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
