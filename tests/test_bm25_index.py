"""BM25Index (incremental inverted index): additivity vs the one-shot
scorer, store-backed restart, compaction, band-partitioned layout."""

import os

import pytest
from pyspark.sql import functions as F

from pgsync_spark.functions.bm25_index import (
    BM25_INDEX_BANDS,
    BM25Index,
    _band_of,
)
from pgsync_spark.queries import BM25_QUERY_TERMS, REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _oneshot(spark):
    return [
        tuple(r)
        for r in REGISTRY["text_bm25_topk"].fn(spark, SF_DIR).collect()
    ]


@pytest.mark.slow
def test_incremental_matches_oneshot_across_restart_and_compact(
    spark, tmp_path
):
    """The additivity contract end to end: build across two processes
    (close + load between batches), query the held state, compact —
    every stage scores bit-identically to one-shot BM25 over the same
    docs."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    store = str(tmp_path / "bm25")

    idx = BM25Index(spark, store_dir=store)
    idx.ingest(docs.filter(F.col("doc_id") % 3 == 0))
    idx.ingest(docs.filter(F.col("doc_id") % 3 == 1))
    idx.close()

    idx2 = BM25Index.load(spark, store)
    idx2.ingest(docs.filter(F.col("doc_id") % 3 == 2))
    expected = _oneshot(spark)
    got = [tuple(r) for r in idx2.topk(BM25_QUERY_TERMS).collect()]
    assert got == expected

    idx2.compact()
    assert len(idx2._segments) == 1
    got = [tuple(r) for r in idx2.topk(BM25_QUERY_TERMS).collect()]
    assert got == expected
    idx2.close()

    # and a cold reload of the compacted store still answers
    idx3 = BM25Index.load(spark, store)
    got = [tuple(r) for r in idx3.topk(BM25_QUERY_TERMS).collect()]
    assert got == expected
    idx3.close()


def test_postings_band_layout_and_query_pruning(spark, tmp_path):
    """Postings land under band=N partition dirs (the on-disk pruning
    unit), the query's plan filters on the literal band set of its
    terms, and zero-token docs still count toward N/avgdl via
    docstats."""
    store = str(tmp_path / "bm25")
    idx = BM25Index(spark, store_dir=store)
    idx.ingest(
        spark.createDataFrame(
            [
                (1, "spark query engine", "en", "s0"),
                (2, "", "en", "s0"),  # zero tokens: stats-only doc
            ],
            "doc_id bigint, text string, lang string, source string",
        )
    )
    seg = os.path.join(store, "postings", "epoch=0")
    bands = {b for b in os.listdir(seg) if b.startswith("band=")}
    assert bands == {
        f"band={_band_of(t)}" for t in ("spark", "query", "engine")
    }

    out = idx.topk(("spark",), k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # the literal band predicate must survive into the postings-slice
    # Filter (a bare substring check on the band number matches
    # vacuously against expression ids — anchor on the comparison)
    import re

    assert re.search(
        rf"band#\d+L? (= {_band_of('spark')}\)|IN \({_band_of('spark')})",
        final,
    ), final
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [1]
    # N=2 (the empty doc counts): idf = ln(1 + (2-1+0.5)/(1+0.5))
    import math

    idf_micro = math.floor(math.log(1 + 1.5 / 1.5) * 1e6 + 0.5)
    assert rows[0]["score_micro"] <= 2_200_000  # tf-normalized < k1+1 x idf
    assert rows[0]["score_micro"] > 0 and idf_micro == 693147
    idx.close()


def test_empty_index_topk_is_typed_empty(spark):
    idx = BM25Index(spark)
    out = idx.topk(BM25_QUERY_TERMS)
    assert out.count() == 0
    assert out.columns == ["doc_id", "lang", "source", "score_micro", "rank"]
    # an all-stopwords query (empty terms) on a NON-empty index is the
    # same typed empty, not a zero-agg-columns analysis crash
    idx.ingest(
        spark.createDataFrame(
            [(1, "spark", "en", "s0")],
            "doc_id bigint, text string, lang string, source string",
        )
    )
    out = idx.topk(())
    assert out.count() == 0
    assert out.columns == ["doc_id", "lang", "source", "score_micro", "rank"]
    idx.close()


def test_stats_only_batch_still_counts_toward_n(spark, tmp_path):
    """r7 review finding: a batch whose every doc has ZERO tokens holds
    no postings but must still extend N / sum_dl — the additivity the
    oracle rests on. Pre-fix, the shared _append gated docstats on the
    postings count, silently dropping those docs from the stats (and
    the loss survived restart)."""
    import math

    schema = "doc_id bigint, text string, lang string, source string"
    store = str(tmp_path / "bm25")
    idx = BM25Index(spark, store_dir=store)
    idx.ingest(spark.createDataFrame([(1, "spark", "en", "s0")], schema))
    idx.ingest(
        spark.createDataFrame(
            [(2, "", "en", "s0"), (3, "   ", "en", "s1")], schema
        )
    )
    assert idx.vals is not None and idx.vals.count() == 3

    # score hand-computed at N=3 (the zero-token docs in the stats):
    # avgdl = 1/3, tfn = 2.2 / (1 + 1.2*(0.25 + 0.75*3)) = 0.55,
    # idf = ln(1 + (3 - 1 + 0.5)/1.5)
    expected = math.floor(
        math.floor(math.log(1 + 2.5 / 1.5) * 1e6 + 0.5) * 0.55 + 0.5
    )
    rows = idx.topk(("spark",), 5).collect()
    assert [(r["doc_id"], r["score_micro"]) for r in rows] == [(1, expected)]
    idx.close()

    # the stats-only segment survives restart (vals dir without a keys
    # dir) and compaction of a one-sided part list
    idx2 = BM25Index.load(spark, store)
    assert idx2.vals.count() == 3
    rows2 = idx2.topk(("spark",), 5).collect()
    assert [tuple(r) for r in rows2] == [tuple(r) for r in rows]
    idx2.compact()
    assert [tuple(r) for r in idx2.topk(("spark",), 5).collect()] == [
        tuple(r) for r in rows
    ]
    idx2.close()


@pytest.mark.slow
def test_bm25_index_through_the_streaming_pipeline(spark, tmp_path):
    """start_dedup_stream drives a BM25Index unchanged (empty
    decisions -> every doc accepted; same exactly-once epoch commits,
    markers, compaction): the training-data ingestion stream IS the
    search-index maintenance loop. After two micro-batches the held
    index answers queries over everything streamed, and a second
    drain over the same checkpoint resumes the store."""
    import json

    from pgsync_spark.streaming.stream import start_dedup_stream

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    rows = [
        (1, "spark query engine fundamentals", "en", "s0"),
        (2, "unrelated cooking recipes", "en", "s1"),
        (3, "vector query planning in spark", "en", "s0"),
    ]
    with open(docs_dir / "b0.json", "w") as f:
        for r in rows[:2]:
            f.write(json.dumps(dict(zip(
                ("doc_id", "text", "lang", "source"), r))) + "\n")
    with open(docs_dir / "b1.json", "w") as f:
        f.write(json.dumps(dict(zip(
            ("doc_id", "text", "lang", "source"), rows[2]))) + "\n")
    os.utime(docs_dir / "b0.json", (1_000_000, 1_000_000))
    os.utime(docs_dir / "b1.json", (2_000_000, 2_000_000))

    store = str(tmp_path / "bm25")
    idx = BM25Index(spark, store_dir=store)
    q = start_dedup_stream(
        spark,
        idx,
        str(docs_dir),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
        max_files_per_trigger=1,
        compact_every=2,
    )
    q.processAllAvailable()
    q.stop()
    accepted = spark.read.parquet(str(tmp_path / "out" / "accepted"))
    assert sorted(r["doc_id"] for r in accepted.collect()) == [1, 2, 3]
    got = idx.topk(("spark", "query"), k=3).collect()
    # docs 1 and 3 hold both terms (doc 1 shorter -> higher tf norm),
    # doc 2 holds neither and scores 0 (excluded)
    assert [r["doc_id"] for r in got] == [1, 3]
    assert idx._segments == ["compacted-2"]  # compact_every fired
    idx.close()

    # resume: a third file, same checkpoint, reloaded store
    with open(docs_dir / "b2.json", "w") as f:
        f.write(json.dumps({"doc_id": 4, "text": "spark spark spark",
                            "lang": "en", "source": "s1"}) + "\n")
    os.utime(docs_dir / "b2.json", (3_000_000, 3_000_000))
    idx2 = BM25Index.load(spark, store)
    q = start_dedup_stream(
        spark,
        idx2,
        str(docs_dir),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
        max_files_per_trigger=1,
        compact_every=2,
    )
    q.processAllAvailable()
    q.stop()
    got = idx2.topk(("spark",), k=5).collect()
    assert {r["doc_id"] for r in got} == {1, 3, 4}
    assert got[0]["doc_id"] == 4  # tf=3 of dl=3 wins
    idx2.close()


@pytest.mark.parametrize("n_batches", [2, 5])
def test_additivity_holds_for_arbitrary_splits(spark, n_batches):
    """The additivity contract is split-independent: ANY partition of
    the corpus into ingestion batches (here: hash-assigned, unequal
    sizes, arrival order by hash value — nothing like the %3 oracle
    split) must score bit-identically to one-shot BM25. This is the
    property the oracle's fixed split cannot cover by itself."""
    from pyspark.sql import functions as F

    from pgsync_spark.functions.hashing import h32

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    expected = _oneshot(spark)
    idx = BM25Index(spark)
    part = h32(F.concat(F.col("doc_id").cast("string"), F.lit(":split")))
    sizes = []
    for k in range(n_batches):
        b = docs.filter(part % n_batches == k)
        sizes.append(b.count())
        idx.ingest(b)
    assert min(sizes) > 0 and len(set(sizes)) > 1  # real, unequal split
    got = [tuple(r) for r in idx.topk(BM25_QUERY_TERMS).collect()]
    assert got == expected
    idx.close()


def test_band_of_mirrors_h32(spark):
    """The Python-side band (query planning literal) must equal the
    engine-side band (h32 % BANDS) for every term, or pruning would
    silently skip real postings."""
    from pgsync_spark.functions.hashing import h32

    terms = ["spark", "vector", "query", "the", "für", "零"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        r["term"]: r["band"]
        for r in df.select(
            "term",
            (h32(F.col("term")) % F.lit(BM25_INDEX_BANDS)).alias("band"),
        ).collect()
    }
    assert got == {t: _band_of(t) for t in terms}


# --------------------------- CDC lifecycle ---------------------------


def _fresh_oneshot_topk(spark, corpus_df, terms=BM25_QUERY_TERMS, k=10):
    """One-shot index over a corpus = the ground truth for CDC state
    (additivity vs the registry oracle is proven elsewhere)."""
    ref = BM25Index(spark)
    ref.ingest(corpus_df)
    out = [tuple(r) for r in ref.topk(terms, k=k).collect()]
    ref.close()
    return out


def test_cdc_update_delete_matches_post_cdc_oneshot(spark):
    """The verdict-r7 'done' shape: ingest -> UPDATE a doc currently
    in the top-k (its query terms removed: it must drop out) -> DELETE
    another top-k doc -> topk bit-matches a one-shot index built from
    the post-CDC corpus."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    idx = BM25Index(spark)
    idx.ingest(docs.filter(F.col("doc_id") % 2 == 0))
    idx.ingest(docs.filter(F.col("doc_id") % 2 == 1))
    pre = idx.topk(BM25_QUERY_TERMS).collect()
    assert len(pre) >= 2
    u_id, d_id = pre[0]["doc_id"], pre[1]["doc_id"]

    cdc = spark.createDataFrame(
        [
            (u_id, "nothing relevant remains here", "en", "s0", "u"),
            (d_id, None, None, None, "d"),
        ],
        "doc_id bigint, text string, lang string, source string, op string",
    )
    decisions = idx.apply_cdc(cdc)
    assert [r["doc_id"] for r in decisions.collect()] == [d_id]

    got = [tuple(r) for r in idx.topk(BM25_QUERY_TERMS).collect()]
    post_ids = {t[0] for t in got}
    assert u_id not in post_ids and d_id not in post_ids

    post_corpus = docs.filter(F.col("doc_id") != d_id).withColumn(
        "text",
        F.when(
            F.col("doc_id") == u_id, F.lit("nothing relevant remains here")
        ).otherwise(F.col("text")),
    )
    assert got == _fresh_oneshot_topk(spark, post_corpus)
    idx.close()


@pytest.mark.slow
def test_cdc_fold_at_compact_and_cold_reload(spark, tmp_path):
    """compact() physically folds the overlay (shadowed versions +
    tombstones dropped, everything back to op='a'), the answer is
    unchanged, and a cold reload of the folded store still answers —
    and no longer holds the deleted doc at all."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    store = str(tmp_path / "bm25")
    idx = BM25Index(spark, store_dir=store)
    idx.ingest(docs)
    pre = idx.topk(BM25_QUERY_TERMS).collect()
    u_id, d_id = pre[0]["doc_id"], pre[1]["doc_id"]
    idx.apply_cdc(
        spark.createDataFrame(
            [
                (u_id, "spark spark spark", "en", "s0", "u"),
                (d_id, None, None, None, "d"),
            ],
            "doc_id bigint, text string, lang string, source string, "
            "op string",
        )
    )
    expected = [tuple(r) for r in idx.topk(BM25_QUERY_TERMS).collect()]
    idx.compact()
    assert idx.vals.filter(F.col("op") != "a").count() == 0
    assert idx.vals.filter(F.col("doc_id") == d_id).count() == 0
    assert (
        idx.keys.filter(F.col("doc_id") == d_id).count() == 0
    )
    assert len(idx._segments) == 1
    assert [tuple(r) for r in idx.topk(BM25_QUERY_TERMS).collect()] == (
        expected
    )
    idx.close()

    idx2 = BM25Index.load(spark, store)
    assert [tuple(r) for r in idx2.topk(BM25_QUERY_TERMS).collect()] == (
        expected
    )
    # the folded store holds exactly one row per live doc, all op='a'
    assert idx2.vals.filter(F.col("op") != "a").count() == 0
    assert idx2.vals.groupBy("doc_id").count().filter(
        F.col("count") > 1
    ).count() == 0
    idx2.close()


def test_cdc_insert_update_same_doc_across_epochs(spark):
    """apply_cdc with a brand-new doc_id is a plain insert (one
    appended version); a later epoch's update shadows it; scoring uses
    the latest version's tf/dl and the live N/avgdl."""
    schema = (
        "doc_id bigint, text string, lang string, source string, op string"
    )
    idx = BM25Index(spark)
    idx.apply_cdc(
        spark.createDataFrame([(1, "spark engine", "en", "s0", "u")], schema)
    )
    idx.apply_cdc(
        spark.createDataFrame(
            [(1, "cooking recipes only", "en", "s0", "u"),
             (2, "spark vector", "en", "s0", "u")],
            schema,
        )
    )
    got = idx.topk(("spark",), k=5).collect()
    assert [r["doc_id"] for r in got] == [2]
    # N=2 live docs (doc 1's old version must not inflate N)
    corpus = spark.createDataFrame(
        [(1, "cooking recipes only", "en", "s0"),
         (2, "spark vector", "en", "s0")],
        "doc_id bigint, text string, lang string, source string",
    )
    assert [tuple(r) for r in got] == _fresh_oneshot_topk(
        spark, corpus, ("spark",), 5
    )
    idx.close()


def test_cdc_all_docs_deleted_then_compact(spark, tmp_path):
    """Tombstoning the whole corpus empties topk; compact() of an
    all-dead store flips the manifest off the old segments (a cold
    reload must not resurrect anything)."""
    schema = (
        "doc_id bigint, text string, lang string, source string"
    )
    store = str(tmp_path / "bm25")
    idx = BM25Index(spark, store_dir=store)
    idx.ingest(
        spark.createDataFrame(
            [(1, "spark", "en", "s0"), (2, "spark query", "en", "s0")],
            schema,
        )
    )
    idx.apply_cdc(
        spark.createDataFrame(
            [(1, None, None, None, "d"), (2, None, None, None, "d")],
            schema + ", op string",
        )
    )
    assert idx.topk(("spark",), k=5).count() == 0
    idx.compact()
    assert idx.topk(("spark",), k=5).count() == 0
    idx.close()
    idx2 = BM25Index.load(spark, store)
    assert idx2.topk(("spark",), k=5).count() == 0
    idx2.close()


def test_apply_cdc_duplicate_doc_in_batch_raises(spark):
    idx = BM25Index(spark)
    batch = spark.createDataFrame(
        [(1, "a", "en", "s0", "u"), (1, None, None, None, "d")],
        "doc_id bigint, text string, lang string, source string, op string",
    )
    with pytest.raises(ValueError, match="multiple rows for doc_id"):
        idx.apply_cdc(batch)
    # the refused batch must not have advanced the epoch bookkeeping
    assert idx.next_epoch() == 0
    idx.close()


def test_cdc_replay_semantics_store_backed(spark, tmp_path):
    """Exactly-once contract for CDC epochs: the committed epoch's
    decisions (= deleted doc_ids) read back via stored_decisions, and
    a second apply of the same epoch refuses (the replay path is
    stored_decisions, never a re-apply)."""
    schema = (
        "doc_id bigint, text string, lang string, source string, op string"
    )
    store = str(tmp_path / "bm25")
    idx = BM25Index(spark, store_dir=store)
    idx.ingest(
        spark.createDataFrame(
            [(1, "spark", "en", "s0"), (2, "vector", "en", "s0")],
            "doc_id bigint, text string, lang string, source string",
        ),
        epoch=0,
    )
    batch = spark.createDataFrame([(2, None, None, None, "d")], schema)
    idx.apply_cdc(batch, epoch=1)
    assert idx.epoch_applied(1)
    stored = idx.stored_decisions(1)
    assert [r["doc_id"] for r in stored.collect()] == [2]
    with pytest.raises(ValueError, match="already applied"):
        idx.apply_cdc(batch, epoch=1)
    idx.close()


def test_cdc_through_the_streaming_pipeline(spark, tmp_path):
    """start_dedup_stream with a CDC-shaped schema drives apply_cdc:
    upserts land in accepted/, deletes in decisions/, the index
    reflects both, and the answer bit-matches a one-shot index over
    the post-CDC corpus — the reference's search-index-under-CDC
    lifecycle (ref: pgsync/sync.py:1254-1343, search_client.py bulk
    delete actions) on the engine's own index."""
    import json

    from pgsync_spark.streaming.stream import (
        CDC_DOCS_SCHEMA,
        start_dedup_stream,
    )

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    b0 = [
        {"doc_id": 1, "text": "spark query engine", "lang": "en",
         "source": "s0", "op": "u"},
        {"doc_id": 2, "text": "vector spark planning", "lang": "en",
         "source": "s0", "op": "u"},
        {"doc_id": 3, "text": "cooking recipes", "lang": "en",
         "source": "s1", "op": "u"},
    ]
    b1 = [
        {"doc_id": 1, "text": "cooking now", "lang": "en", "source": "s0",
         "op": "u"},
        {"doc_id": 2, "op": "d"},
    ]
    with open(docs_dir / "b0.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in b0))
    with open(docs_dir / "b1.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in b1))
    os.utime(docs_dir / "b0.json", (1_000_000, 1_000_000))
    os.utime(docs_dir / "b1.json", (2_000_000, 2_000_000))

    store = str(tmp_path / "bm25")
    idx = BM25Index(spark, store_dir=store)
    q = start_dedup_stream(
        spark,
        idx,
        str(docs_dir),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
        schema=CDC_DOCS_SCHEMA,
        max_files_per_trigger=1,
    )
    q.processAllAvailable()
    q.stop()

    accepted = spark.read.parquet(str(tmp_path / "out" / "accepted"))
    assert sorted(r["doc_id"] for r in accepted.collect()) == [1, 1, 2, 3]
    decisions = spark.read.parquet(str(tmp_path / "out" / "decisions"))
    assert [r["doc_id"] for r in decisions.collect()] == [2]

    got = [tuple(r) for r in idx.topk(("spark", "query")).collect()]
    corpus = spark.createDataFrame(
        [(1, "cooking now", "en", "s0"), (3, "cooking recipes", "en", "s1")],
        "doc_id bigint, text string, lang string, source string",
    )
    assert got == _fresh_oneshot_topk(spark, corpus, ("spark", "query"))
    assert got == []  # no live doc holds the terms after CDC
    idx.close()

    # restart over the same checkpoint: nothing new -> no-op replay,
    # same answer from the reloaded store
    idx2 = BM25Index.load(spark, store)
    q = start_dedup_stream(
        spark,
        idx2,
        str(docs_dir),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
        schema=CDC_DOCS_SCHEMA,
        max_files_per_trigger=1,
    )
    q.processAllAvailable()
    q.stop()
    assert idx2.topk(("spark", "query")).count() == 0
    assert idx2.vals.filter(F.col("op") == "a").count() == 0  # CDC-only
    idx2.close()


@pytest.mark.slow
@pytest.mark.parametrize("seed", [7, 23])
def test_bm25_cdc_fuzz_matches_oneshot(spark, seed):
    """Seeded random CDC lifecycle fuzz: interleaved bulk ingests,
    updates, deletes, CDC inserts, RESURRECTIONS of deleted ids,
    table-level TRUNCATEs (r9), and a mid-sequence compact — after
    every sequence the held state must score bit-identically to a
    one-shot index over the model corpus (the additivity+overlay
    contract under arbitrary histories, not just the hand-written
    scenarios)."""
    import random

    rng = random.Random(seed)
    vocab = ["spark", "query", "vector", "engine", "index", "data",
             "tokens", "cdc", "stream", "delta"]

    def text():
        return " ".join(
            rng.choice(vocab) for _ in range(rng.randint(3, 12))
        )

    schema = "doc_id bigint, text string, lang string, source string"
    model: dict[int, str] = {}
    deleted: list[int] = []
    idx = BM25Index(spark)
    next_id = 0
    for epoch in range(8):
        r = rng.random()
        if model and r < 0.15:
            # table-level truncate (r9): the whole corpus clears as
            # one epoch; bulk re-adds of formerly CDC-touched ids are
            # legal again afterwards (overlay state died with it)
            idx.truncate()
            model.clear()
            deleted.clear()
            continue
        if r < 0.55 or not model:
            rows = []
            for _ in range(rng.randint(1, 5)):
                did, next_id = next_id, next_id + 1
                t = text()
                model[did] = t
                rows.append((did, t, "en", f"s{did % 3}"))
            idx.ingest(spark.createDataFrame(rows, schema))
        else:
            batch: dict[int, tuple] = {}
            for did in rng.sample(
                sorted(model), k=min(len(model), rng.randint(1, 4))
            ):
                if rng.random() < 0.4:
                    batch[did] = (did, None, None, None, "d")
                    deleted.append(did)
                    model.pop(did)
                else:
                    t = text()
                    model[did] = t
                    batch[did] = (
                        did, t, "en", f"s{did % 3}",
                        rng.choice(["u", None]),  # NULL op = upsert
                    )
            for _ in range(rng.randint(0, 2)):  # CDC inserts
                did, next_id = next_id, next_id + 1
                t = text()
                model[did] = t
                batch[did] = (did, t, "en", f"s{did % 3}", "u")
            if deleted and rng.random() < 0.5:  # resurrection
                did = rng.choice(deleted)
                if did not in batch:
                    deleted.remove(did)
                    t = text()
                    model[did] = t
                    batch[did] = (did, t, "en", f"s{did % 3}", "u")
            idx.apply_cdc(
                spark.createDataFrame(
                    list(batch.values()), schema + ", op string"
                )
            )
        if epoch == 4:
            idx.compact()

    corpus = spark.createDataFrame(
        [(k, v, "en", f"s{k % 3}") for k, v in model.items()], schema
    )
    for terms in (("spark",), ("query", "vector"), ("cdc", "engine")):
        got = [tuple(r) for r in idx.topk(terms).collect()]
        assert got == _fresh_oneshot_topk(spark, corpus, terms), (
            seed, terms
        )
    idx.close()

def test_bm25_truncate_clears_corpus_and_restarts(spark, tmp_path):
    """r8 verdict item 3 on the search index: truncate() is the
    corpus-cleared event — decisions are the live ids, topk returns
    empty, the store reloads empty, and a fresh ingest (including
    formerly CDC-touched ids) starts clean."""
    store = str(tmp_path / "bm")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    head = docs.filter(F.col("doc_id") < 20)
    idx = BM25Index(spark, store_dir=store)
    idx.ingest(head)
    idx.apply_cdc(
        spark.createDataFrame(
            [(1, None, None, None, "d")],
            "doc_id bigint, text string, lang string, source string, "
            "op string",
        )
    )
    dec = idx.truncate()
    got = sorted(r.doc_id for r in dec.collect())
    want = sorted(
        r.doc_id for r in head.filter(F.col("doc_id") != 1).collect()
    )
    assert got == want  # only docs live at the truncate instant
    assert idx.topk(BM25_QUERY_TERMS).count() == 0
    assert not idx._has_cdc and idx._overlay_rows == 0
    # doc 1 had CDC history; post-truncate a bulk re-ingest is sound
    idx.ingest(head)
    assert idx.topk(BM25_QUERY_TERMS).count() > 0
    idx.close()
    idx2 = BM25Index.load(spark, store)
    assert idx2.topk(BM25_QUERY_TERMS).count() > 0
    idx2.close()


def test_standard_analyzer_collides_punctuation_variants(spark):
    """'Priority.' and 'priority' are ONE term under the standard
    analyzer (the r9 verdict's acceptance case) and distinct terms
    under whitespace."""
    docs = spark.createDataFrame(
        [
            (1, "Priority.", None, None),
            (2, "priority", None, None),
            (3, "unrelated words", None, None),
        ],
        "doc_id bigint, text string, lang string, source string",
    )
    std = BM25Index(spark, analyzer="standard")
    std.ingest(docs)
    assert std.analyze_terms("Priority!") == ("priority",)
    got = sorted(
        r.doc_id for r in std.topk(std.analyze_terms("priority")).collect()
    )
    assert got == [1, 2]  # both punctuation variants hit
    std.close()

    ws = BM25Index(spark)  # whitespace default
    ws.ingest(docs)
    got = sorted(r.doc_id for r in ws.topk(("priority",)).collect())
    assert got == [2]  # 'priority.' stays a distinct glued token
    ws.close()


def test_analyzer_is_persisted_index_state(spark, tmp_path):
    """The analyzer rides the manifest: a loaded store re-binds the
    analyzer that wrote it, and scores identically across the
    close/load boundary."""
    store = str(tmp_path / "bm_std")
    docs = spark.createDataFrame(
        [(1, "High-Priority order!", None, None), (2, "priority", None, None)],
        "doc_id bigint, text string, lang string, source string",
    )
    idx = BM25Index(spark, store_dir=store, analyzer="standard")
    idx.ingest(docs)
    expected = [tuple(r) for r in idx.topk(("priority",)).collect()]
    assert sorted(t[0] for t in expected) == [1, 2]
    idx.close()

    idx2 = BM25Index.load(spark, store)
    assert idx2.analyzer == "standard"
    assert [tuple(r) for r in idx2.topk(("priority",)).collect()] == expected
    idx2.close()


def test_unknown_analyzer_raises(spark):
    with pytest.raises(ValueError, match="unknown analyzer"):
        BM25Index(spark, analyzer="snowball")

def test_standard_stop_analyzer_drops_stopwords_everywhere(spark, tmp_path):
    """r10 verdict item 5: the "standard_stop" analyzer drops the
    classic English stop list from BOTH the indexed corpus (postings,
    doc length, avgdl) and query text — 'the' scores NOTHING — while
    non-stop tokens rank as under "standard". The analyzer rides the
    manifest like any other."""
    from pgsync_spark.functions.hashing import STOPWORDS, analyze_py

    docs = spark.createDataFrame(
        [
            (1, "The priority of the order", None, None),
            (2, "the the the the the", None, None),
            (3, "priority", None, None),
        ],
        "doc_id bigint, text string, lang string, source string",
    )
    store = str(tmp_path / "bm_stop")
    idx = BM25Index(spark, store_dir=store, analyzer="standard_stop")
    idx.ingest(docs)
    # query-side: stopwords analyze away entirely
    assert idx.analyze_terms("The!") == ()
    assert idx.analyze_terms("the priority of") == ("priority",)
    # a stopword-only query scores nothing — not even doc 2, which is
    # ALL stopwords (it indexed as a zero-token doc)
    assert idx.topk(("the",)).count() == 0
    got = sorted(r.doc_id for r in idx.topk(("priority",)).collect())
    assert got == [1, 3]
    expected = [tuple(r) for r in idx.topk(("priority",)).collect()]
    idx.close()

    # manifest round-trip re-binds the stop analyzer
    idx2 = BM25Index.load(spark, store)
    assert idx2.analyzer == "standard_stop"
    assert [tuple(r) for r in idx2.topk(("priority",)).collect()] == expected
    idx2.close()

    # the list itself is the Lucene/ES classic set — pin a few
    # sentinels so an accidental edit (frozen index vocabulary!)
    # trips a test
    for w in ("the", "of", "and", "with", "will"):
        assert w in STOPWORDS
    assert "order" not in STOPWORDS
    assert analyze_py("These are NOT stopword-free!", "standard_stop") == [
        "stopword", "free"
    ]


def test_analyzer_three_form_parity_property():
    """Property: for every analyzer, the Python mirror and the DuckDB
    SQL mirror tokenize identical ASCII text to identical token lists
    (the parity the oracle gate rests on; the Spark form is exercised
    against the same strings by the oracle-gated queries). Restricted
    to printable ASCII — the documented analyzer contract (exotic
    unicode case-folding may differ between engines and only affects
    driver-side query convenience)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pgsync_spark.functions.hashing import (
        ANALYZERS,
        analyze_py,
        analyze_sql,
    )

    con = duckdb.connect()

    @settings(max_examples=150, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=60,
        )
    )
    def check(text):
        for analyzer in ANALYZERS:
            got = con.execute(
                "SELECT " + analyze_sql("?", analyzer), [text]
            ).fetchone()[0]
            assert (got or []) == analyze_py(text, analyzer), (
                analyzer,
                text,
            )

    check()


def test_standard_stem_analyzer_plural_matches_singular(spark, tmp_path):
    """r11 verdict item 5: the "standard_stem" analyzer (standard_stop
    + the Harman S-removal stemmer) folds plural query terms onto
    singular postings — 'priorities' hits a corpus that only ever
    said 'priority' — with stop filtering running BEFORE stemming
    (the Lucene/ES chain order: 'this' is stopped, never stemmed to
    'thi'). The analyzer rides the manifest like any other."""
    from pgsync_spark.functions.hashing import analyze_py

    docs = spark.createDataFrame(
        [
            (1, "the priority order", None, None),
            (2, "priorities of orders", None, None),
            (3, "urgent delivery", None, None),
        ],
        "doc_id bigint, text string, lang string, source string",
    )
    store = str(tmp_path / "bm_stem")
    idx = BM25Index(spark, store_dir=store, analyzer="standard_stem")
    idx.ingest(docs)
    # query-side: plural -> singular; stopwords still drop first
    assert idx.analyze_terms("Priorities!") == ("priority",)
    assert idx.analyze_terms("the priorities of") == ("priority",)
    assert idx.analyze_terms("this these") == ()  # stopped, not stemmed
    # plural query hits BOTH the singular doc (1) and the plural doc
    # (2) — they share the stemmed postings form
    got = sorted(
        r.doc_id for r in idx.topk(idx.analyze_terms("priorities")).collect()
    )
    assert got == [1, 2]
    # and the singular query is the SAME query after analysis
    assert idx.analyze_terms("priority") == ("priority",)
    expected = [
        tuple(r) for r in idx.topk(("priority", "order")).collect()
    ]
    idx.close()

    # manifest round-trip re-binds the stemming analyzer
    idx2 = BM25Index.load(spark, store)
    assert idx2.analyzer == "standard_stem"
    assert [
        tuple(r) for r in idx2.topk(("priority", "order")).collect()
    ] == expected
    idx2.close()

    # rule pins (frozen index vocabulary — an edit must trip a test):
    # ies->y with e/a exemptions, es->e with a/e/o exemptions,
    # s-drop with u/s exemptions
    cases = {
        "priorities": "priority", "classes": "classe", "dogs": "dog",
        "kiss": "kiss", "bus": "bus", "oases": "oase",
        "priority": "priority", "urgent": "urgent",
    }
    for w, want in cases.items():
        assert analyze_py(w, "standard_stem") == [want], (w, want)
