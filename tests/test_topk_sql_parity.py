"""Pinned parity: the one-SQL topk path (BM25Index._topk_sql /
VectorIndex._topk_sql) must produce the IDENTICAL Catalyst tree — and
byte-identical rows — as the Column-API twin (_topk_df) it replaces on
the serving paths.

The pin is optimized-plan ``sameResult`` (canonical plan equality)
PLUS byte-equality of collected rows, across: no-CDC and CDC-overlay
stores, multi-part unions, exclude_self on/off, probe_hamming 0/1/2,
single- and multi-term BM25 queries, and post-compact stores. The
sqlgen discipline (tests/test_sqlgen_parity.py) applied to the index
serving paths."""

import pytest
from pyspark.sql import functions as F

from pgsync_spark.functions.bm25_index import BM25Index
from pgsync_spark.functions.vector_index import VectorIndex
from pgsync_spark.queries import BM25_QUERY_TERMS

from conftest import SF_DIR


def _same_optimized(a, b) -> bool:
    return (
        a._jdf.queryExecution()
        .optimizedPlan()
        .sameResult(b._jdf.queryExecution().optimizedPlan())
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _check(old, new, label):
    assert _same_optimized(old, new), f"{label}: optimized plans differ"
    ro, rn = _rows(old), _rows(new)
    assert ro == rn, f"{label}: rows differ"
    assert len(rn) > 0, f"{label}: vacuous (no rows)"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture()
def queries(emb):
    from pgsync_spark.functions.similarity import N_QUERIES

    return emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _vcdc(emb):
    return emb.filter("vec_id >= 5 and vec_id < 25").select(
        "vec_id",
        F.expr("transform(embedding, x -> -x)").alias("embedding"),
        F.when(F.col("vec_id") < 15, F.lit("u"))
        .otherwise(F.lit("d"))
        .alias("op"),
    )


@pytest.mark.parametrize(
    "k,exclude_self,hamming",
    [(10, True, 1), (3, False, 1), (10, True, 0), (10, True, 2)],
)
def test_vector_topk_sql_parity(spark, emb, queries, k, exclude_self, hamming):
    vidx = VectorIndex(spark, probe_hamming=hamming)
    try:
        vidx.ingest(emb)
        old = vidx._topk_df(queries, k, exclude_self)
        new = vidx.topk(queries, k=k, exclude_self=exclude_self)
        _check(old, new, f"vector k={k} self={exclude_self} h={hamming}")
    finally:
        vidx.close()


def test_vector_topk_sql_parity_cdc_and_compact(spark, emb, queries):
    vidx = VectorIndex(spark)
    try:
        # two bulk parts + a CDC epoch: multi-part union AND overlay
        vidx.ingest(emb.filter("vec_id % 2 = 0"))
        vidx.ingest(emb.filter("vec_id % 2 = 1"))
        vidx.apply_cdc(_vcdc(emb))
        assert vidx._has_cdc
        old = vidx._topk_df(queries, 10, True)
        new = vidx.topk(queries, exclude_self=True)
        _check(old, new, "vector cdc")
        # compact folds the overlay physically and swaps the parts —
        # the memoized views must re-register, and the SQL path must
        # drop the overlay fold exactly like the Column path does
        vidx.compact(force=True)
        assert not vidx._has_cdc
        old2 = vidx._topk_df(queries, 10, True)
        new2 = vidx.topk(queries, exclude_self=True)
        _check(old2, new2, "vector post-compact")
        assert _rows(new) == _rows(new2), "compact changed results"
    finally:
        vidx.close()


@pytest.mark.parametrize(
    "terms,k",
    [(BM25_QUERY_TERMS, 10), (("spark",), 5)],
)
def test_bm25_topk_sql_parity(spark, docs, terms, k):
    bidx = BM25Index(spark)
    try:
        bidx.ingest(docs)
        old = bidx._topk_df(terms, k)
        new = bidx.topk(terms, k=k)
        _check(old, new, f"bm25 terms={terms}")
    finally:
        bidx.close()


def test_bm25_topk_sql_parity_cdc(spark, docs):
    bidx = BM25Index(spark)
    try:
        bidx.ingest(docs)
        cdc = docs.limit(40).select(
            "doc_id",
            F.concat(F.lit("spark vector updated "), F.col("text")).alias(
                "text"
            ),
            "lang",
            "source",
            F.when(F.col("doc_id") % 3 == 0, F.lit("d"))
            .otherwise(F.lit("u"))
            .alias("op"),
        )
        bidx.apply_cdc(cdc)
        assert bidx._has_cdc
        old = bidx._topk_df(BM25_QUERY_TERMS, 10)
        new = bidx.topk(BM25_QUERY_TERMS, k=10)
        _check(old, new, "bm25 cdc")
    finally:
        bidx.close()


def test_bm25_topk_escapes_hostile_terms(spark, docs):
    """A query term with a quote/backslash must stay a literal (the
    _spark_sql_str escaper), matching the Column form's F.lit verbatim
    semantics — no parse error, no injection, same (empty) result."""
    bidx = BM25Index(spark)
    try:
        bidx.ingest(docs)
        hostile = ("spark", "o'brien\\x) OR (1=1")
        old = bidx._topk_df(hostile, 10)
        new = bidx.topk(hostile, k=10)
        assert _same_optimized(old, new)
        assert _rows(old) == _rows(new)
    finally:
        bidx.close()


def test_topk_views_drop_on_close(spark, docs):
    bidx = BM25Index(spark)
    bidx.ingest(docs)
    bidx.topk(BM25_QUERY_TERMS, k=10).count()
    names = [n for (_p, n, _c) in bidx._topk_views.values()]
    assert names and all(
        spark.catalog.tableExists(n) for n in names
    )
    bidx.close()
    assert not any(spark.catalog.tableExists(n) for n in names)


def test_topk_sql_from_cloned_session_frames(spark, docs):
    """foreachBatch hands the index frames bound to a CLONED
    SparkSession whose session-temp-view catalog is isolated — the
    one-SQL path must still resolve (global temp views). Clone via
    newSession(), the same catalog-isolation shape."""
    clone = spark.newSession()
    cdocs = clone.read.parquet(f"{SF_DIR}/documents.parquet")
    bidx = BM25Index(spark)
    try:
        bidx.ingest(cdocs)  # parts bound to the clone
        old = bidx._topk_df(BM25_QUERY_TERMS, 10)
        new = bidx.topk(BM25_QUERY_TERMS, k=10)
        assert _rows(old) == _rows(new)
        assert len(_rows(new)) > 0
    finally:
        bidx.close()
