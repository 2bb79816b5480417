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


def test_dedup_caches_released(spark):
    """Multi-consumer dedup stages persist intermediates; after
    caching.release(result) nothing stays pinned in executor memory.
    (dedup_clusters is excluded: its localCheckpoint label frames are
    owned by the returned result and freed by the ContextCleaner.)"""
    from pgsync_spark import caching

    caching.release_all()
    spark.catalog.clearCache()
    base = spark.sparkContext._jsc.getPersistentRDDs().size()
    for name in (
        "dedup_minhash_signatures",
        "dedup_minhash_lsh_pairs",
        "dedup_ngram_jaccard_pairs",
    ):
        df = REGISTRY[name].fn(spark, SF_DIR)
        df.count()
        caching.release(df)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == base


def test_lsh_bucket_cap_drops_hot_buckets(spark):
    """A corpus where every doc shares one band bucket (identical text)
    must not go quadratic: the hot bucket is dropped and the pair set
    is capped, while small buckets still pair."""
    from pgsync_spark.functions import dedup

    n = dedup.MAX_BUCKET_WIDTH + 10
    docs = spark.range(n).selectExpr(
        "id AS doc_id",
        # identical text -> identical signature -> one bucket per band,
        # every bucket width n > MAX_BUCKET_WIDTH
        "'the same boilerplate text repeated across every document' AS text",
    )
    from pgsync_spark import caching

    pairs = dedup.minhash_lsh_pairs(docs, log_drops=True)
    assert pairs.count() == 0  # all buckets hot -> all dropped
    caching.release(pairs)


def test_connected_components_nonconvergence_signals(spark, caplog):
    """A path graph with diameter > max_rounds must NOT return wrong
    labels silently: strict=True raises, default logs a warning with
    the count of still-changing labels (VERDICT r2 item 6)."""
    import logging
    import pytest
    from pgsync_spark.functions import dedup

    # path 0-1-2-...-29: diameter 29 > max_rounds=3
    pairs = spark.range(29).selectExpr("id AS id1", "id + 1 AS id2")
    with pytest.raises(dedup.NonConvergenceError, match="still changing"):
        dedup.connected_components(pairs, max_rounds=3, strict=True)
    with caplog.at_level(logging.WARNING, logger="pgsync_spark.functions.dedup"):
        labels = dedup.connected_components(pairs, max_rounds=3)
        labels.count()
    assert any("did not converge" in r.message for r in caplog.records)


def test_connected_components_converged_is_quiet(spark, caplog):
    """A graph that fits in the round budget converges with no warning
    and the correct min-label components."""
    import logging
    from pgsync_spark.functions import dedup

    # two components: {0,1,2}, {10,11}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id1 long, id2 long"
    )
    with caplog.at_level(logging.WARNING, logger="pgsync_spark.functions.dedup"):
        got = {
            (r["id"], r["label"])
            for r in dedup.connected_components(pairs, max_rounds=9).collect()
        }
    assert got == {(0, 0), (1, 0), (2, 0), (10, 10), (11, 10)}
    assert not any("did not converge" in r.message for r in caplog.records)
