"""Parity pins for the one-SQL ann_recall_eval construction.

The eval's ten method legs + hit/spine tail are built as ONE
spark.sql text (similarity._recall_eval_sparksql) over temp views of
the artifact frames; similarity._recall_eval_df is the Column-API
reference. These tests pin:

- byte-equal rows and identical schema between the two forms (the
  DuckDB oracle gate additionally value-checks the SQL form every
  round);
- physical plan-shape equality on the operators that matter
  (exchanges, joins, windows, aggregates, cache scans) — the text
  form must not change how the eval executes;
- the persisted artifact frames actually serve the legs
  (InMemoryTableScan present): dropTempView on a frame-backed view
  UNCACHES the frame (CacheManager cascade), which an early
  implementation hit — every leg silently recomputed its artifact
  subtree;
- the fixed __recall_* view set stays bounded across calls
  (createOrReplaceTempView, never accumulated).
"""

from conftest import SF_DIR
from pgsync_spark import Catalog, caching
from pgsync_spark.functions import similarity as S


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _counts(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        k: plan.count(f" {k} ")
        for k in (
            "Exchange",
            "BroadcastHashJoin",
            "SortMergeJoin",
            "Window",
            "HashAggregate",
            "InMemoryTableScan",
            "Union",
        )
    }


def test_recall_eval_sql_matches_column_twin(spark):
    df = Catalog(spark, SF_DIR).df("embeddings")
    a = S.ann_recall_eval(df)
    b = S._recall_eval_df(df)
    try:
        assert [(f.name, f.dataType) for f in a.schema.fields] == [
            (f.name, f.dataType) for f in b.schema.fields
        ]
        assert _rows(a) == _rows(b)
    finally:
        caching.release(a)
        caching.release(b)


def test_recall_eval_sql_plan_shape_matches(spark):
    df = Catalog(spark, SF_DIR).df("embeddings")
    a = S.ann_recall_eval(df)
    b = S._recall_eval_df(df)
    try:
        ca, cb = _counts(a), _counts(b)
        assert ca == cb, (ca, cb)
        # the artifact caches must actually serve the legs: exact,
        # 2x(ranked|tranked consumers), 5 codes readers, ... — an
        # uncached SQL form re-executes Lloyd/encode per leg
        assert ca["InMemoryTableScan"] >= 10, ca
    finally:
        caching.release(a)
        caching.release(b)


def test_recall_eval_views_bounded(spark):
    df = Catalog(spark, SF_DIR).df("embeddings")
    for _ in range(2):
        out = S.ann_recall_eval(df)
        out.count()
        caching.release(out)
    fixed = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("__recall_")
    ]
    assert len(fixed) == 8, sorted(fixed)


def test_standalone_ann_sql_fast_paths_match_column(spark):
    """Each standalone ANN registry query's one-SQL construction
    returns byte-equal rows and identical schema vs its Column form
    (_SQL_ANN off)."""
    df = Catalog(spark, SF_DIR).df("embeddings")
    fns = (
        S.ann_bruteforce_topk,
        S.ann_ivf_trained_topk,
        S.ann_pq_adc_topk,
        S.ann_pq_adc_trained_topk,
        S.ann_ivfpq_topk,
    )
    for fn in fns:
        assert S._SQL_ANN, "flag must default on"
        a = fn(df)
        try:
            rows_sql = _rows(a)
            schema_sql = [(f.name, f.dataType) for f in a.schema.fields]
        finally:
            caching.release(a)
        S._SQL_ANN = False
        try:
            b = fn(df)
            try:
                assert schema_sql == [
                    (f.name, f.dataType) for f in b.schema.fields
                ], fn.__name__
                assert rows_sql == _rows(b), fn.__name__
            finally:
                caching.release(b)
        finally:
            S._SQL_ANN = True


def test_lexical_hybrid_sql_fast_paths_match_column(spark):
    """text_bm25_topk and hybrid_search_rrf one-SQL constructions
    return byte-equal rows and identical schema vs their Column
    twins."""
    import pgsync_spark.queries as Q

    pairs = (
        (Q.text_bm25_topk, Q._text_bm25_topk_df),
        (Q.hybrid_search_rrf, Q._hybrid_search_rrf_df),
        (Q.ccnet_perplexity_buckets, Q._ccnet_perplexity_buckets_df),
        (
            Q.ccnet_perplexity_buckets_sampled,
            Q._ccnet_perplexity_buckets_sampled_df,
        ),
        (Q.dsir_select, Q._dsir_select_df),
    )
    for sqlfn, colfn in pairs:
        assert Q._SQL_TEXTQ, "flag must default on"
        a = sqlfn(spark, SF_DIR)
        b = colfn(spark, SF_DIR)
        try:
            assert [(f.name, f.dataType) for f in a.schema.fields] == [
                (f.name, f.dataType) for f in b.schema.fields
            ], sqlfn.__name__
            assert _rows(a) == _rows(b), sqlfn.__name__
        finally:
            caching.release(a)
            caching.release(b)


def test_recall_eval_clustered_parity(spark):
    corpus = S.clustered_corpus(
        Catalog(spark, SF_DIR).df("embeddings")
    ).persist()
    try:
        a = S.ann_recall_eval(corpus)
        b = S._recall_eval_df(corpus)
        try:
            assert _rows(a) == _rows(b)
        finally:
            caching.release(a)
            caching.release(b)
    finally:
        corpus.unpersist()
