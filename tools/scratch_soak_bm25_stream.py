"""Scale-soak of the CDC-maintained BM25 index at bench batch sizes
(VERDICT r7 item 7, extended with the r8 CDC lifecycle): N_EPOCHS x
DOCS_PER_EPOCH (default 8 x 5000 — each epoch the size of the whole
sf0.1 documents table) through start_dedup_stream with a store-backed
BM25Index and the CDC-shaped schema, compaction every 3 epochs.

Per epoch k>0 the batch is REAL CDC traffic, not just appends: 4400
new docs + 500 UPDATES of epoch k-1 docs + 100 DELETES of epoch k-1
docs — so the versioned-overlay path (apply_cdc tombstones + shadowed
versions) and its compaction fold run at full batch width every epoch.

Three claims under test:
  1. per-epoch ingest wall is O(batch), FLAT in held state (the same
     eager-localCheckpoint + segment-compaction discipline the dedup
     soak proved; BM25 adds the per-batch explode->tf shuffle).
  2. topk latency stays flat as the corpus grows 8x: the query is a
     band-pruned postings slice + broadcast overlay fold, never a
     corpus rescan. Measured per epoch on a planted term.
  3. the overlay fold is CORRECT under soak: after the final epoch the
     planted query's top hit set reflects updates (moved docs) and
     deletes (gone docs); deleted doc_ids never appear.

Harness discipline: files staged OUTSIDE the watched dir and renamed
in (see scratch_soak_dedup_stream.py for the torn-epoch failure mode).

Usage: python scratch_soak_bm25_stream.py  (prints one JSON line;
paste the table into EXPLAIN.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

N_EPOCHS = 8
DOCS_PER_EPOCH = 5000
N_UPDATES = 500
N_DELETES = 100
QUERY_TERM = "soakquery"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pgsync_spark import get_spark
    from pgsync_spark.functions.bm25_index import BM25Index
    from pgsync_spark.streaming.stream import (
        CDC_DOCS_SCHEMA,
        start_dedup_stream,
    )

    spark = get_spark("bm25-soak")
    base = [
        (r["doc_id"], r["text"], r["lang"], r["source"])
        for r in spark.read.parquet(
            os.path.join(SF_DIR, "documents.parquet")
        ).collect()
    ][:DOCS_PER_EPOCH]

    tmp = tempfile.mkdtemp(prefix="bm25_soak_")
    docs_dir = os.path.join(tmp, "docs")
    os.makedirs(docs_dir)

    def doc_text(k: int, i: int, text: str) -> str:
        # disjoint token sets across (k, i) so df stats exercise the
        # worst case (every new doc adds new terms); every 100th doc
        # carries the planted query term
        body = " ".join(f"{w}{k}x{i}" for w in text.split())
        if i % 100 == 0:
            body += f" {QUERY_TERM}"
        return body

    def write_epoch(k: int) -> None:
        stage = os.path.join(tmp, f"stage_b{k:03d}.json")
        with open(stage, "w") as f:
            n_new = DOCS_PER_EPOCH if k == 0 else (
                DOCS_PER_EPOCH - N_UPDATES - N_DELETES
            )
            for i in range(n_new):
                _, text, lang, source = base[i]
                f.write(json.dumps({
                    "doc_id": k * 1_000_000 + i,
                    "text": doc_text(k, i, text),
                    "lang": lang, "source": source, "op": "u",
                }) + "\n")
            if k > 0:
                # updates REWRITE epoch k-1 docs (new token salt ->
                # the old postings must stop matching); update range
                # disjoint from the delete range
                for i in range(N_UPDATES):
                    _, text, lang, source = base[i]
                    f.write(json.dumps({
                        "doc_id": (k - 1) * 1_000_000 + i,
                        "text": doc_text(k * 101 + 7, i, text),
                        "lang": lang, "source": source, "op": "u",
                    }) + "\n")
                for i in range(N_UPDATES, N_UPDATES + N_DELETES):
                    f.write(json.dumps({
                        "doc_id": (k - 1) * 1_000_000 + i, "op": "d",
                    }) + "\n")
        os.replace(stage, os.path.join(docs_dir, f"b{k:03d}.json"))

    index = BM25Index(spark, store_dir=os.path.join(tmp, "store"))
    q = start_dedup_stream(
        spark,
        index,
        docs_dir,
        os.path.join(tmp, "ckpt"),
        os.path.join(tmp, "out"),
        schema=CDC_DOCS_SCHEMA,
        max_files_per_trigger=1,
        compact_every=3,
    )
    epochs = []
    try:
        for k in range(N_EPOCHS):
            write_epoch(k)
            t0 = time.perf_counter()
            q.processAllAvailable()
            ingest_s = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            top = index.topk((QUERY_TERM,), k=10).collect()
            query_s = round(time.perf_counter() - t0, 2)
            segs = len(index._segments)
            epochs.append({
                "epoch": k, "ingest_sec": ingest_s, "query_sec": query_s,
                "segments": segs, "top1": top[0]["doc_id"] if top else None,
            })
            print(
                f"# epoch {k}: ingest {ingest_s}s, query {query_s}s, "
                f"{segs} segments",
                file=sys.stderr,
            )
        # correctness under soak: planted-term hits never include a
        # deleted doc, and updated docs answer with their NEW version
        # (old-salt tokens of an updated doc must not match anything)
        deleted = {
            (k - 1) * 1_000_000 + i
            for k in range(1, N_EPOCHS)
            for i in range(N_UPDATES, N_UPDATES + N_DELETES)
        }
        hits = {r["doc_id"] for r in index.topk((QUERY_TERM,), k=50).collect()}
        assert not (hits & deleted), hits & deleted
        # doc 0 of epoch N-2 was updated with salt (N-1)*101+7: a token
        # from its ORIGINAL epoch-(N-2) version must be gone
        w0 = base[0][1].split()[0]
        stale = index.topk((f"{w0.lower()}{N_EPOCHS - 2}x0",), k=5).collect()
        assert stale == [], stale
        fresh = index.topk(
            (f"{w0.lower()}{(N_EPOCHS - 1) * 101 + 7}x0",), k=5
        ).collect()
        assert [r["doc_id"] for r in fresh] == [
            (N_EPOCHS - 2) * 1_000_000 + 0
        ], fresh
        ing = [e["ingest_sec"] for e in epochs]
        qs = [e["query_sec"] for e in epochs]
        out = {
            "metric": "bm25_stream_soak",
            "docs_per_epoch": DOCS_PER_EPOCH,
            "updates_per_epoch": N_UPDATES,
            "deletes_per_epoch": N_DELETES,
            "n_epochs": N_EPOCHS,
            "epochs": epochs,
            "ingest_late_over_early": round(
                sorted(ing[-3:])[1] / sorted(ing[1:4])[1], 2
            ),
            "query_late_over_early": round(
                sorted(qs[-3:])[1] / sorted(qs[1:4])[1], 2
            ),
            "cdc_semantics": "pass",
        }
        print(json.dumps(out))
    finally:
        q.stop()
        index.close()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
