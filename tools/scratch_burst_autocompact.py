"""Overlay auto-compaction burst demo (r9 verdict item 4 'done'):
drive a CDC burst through a BM25Index with compact_every effectively
disabled, measure topk latency as the overlay grows, and show the
overlay_cap auto-compaction resetting it.

Usage: python scratch_burst_autocompact.py [n_epochs] [docs_per_epoch]
Prints one line per CDC epoch: overlay rows, whether the cap fired,
and the median-of-3 topk latency after the epoch.
"""

import sys
import time

from pyspark.sql import functions as F

from pgsync_spark import get_spark
from pgsync_spark.functions.bm25_index import BM25Index
from pgsync_spark.queries import BM25_QUERY_TERMS

N_EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 12
PER_EPOCH = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
CAP = int(sys.argv[3]) if len(sys.argv) > 3 else 8000

spark = get_spark("burst-autocompact")
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
n_docs = docs.count()

idx = BM25Index(spark, overlay_cap=CAP)
idx.ingest(docs)
print(f"corpus {n_docs} docs, overlay_cap {CAP}, "
      f"{N_EPOCHS} CDC epochs x {PER_EPOCH} updates", flush=True)


def topk_med3():
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        idx.topk(BM25_QUERY_TERMS, k=10).collect()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1]


base = topk_med3()
print(f"epoch -  overlay 0  topk {base:.2f}s (append-only baseline)",
      flush=True)
for e in range(N_EPOCHS):
    lo = (e * PER_EPOCH) % n_docs
    batch = docs.filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + PER_EPOCH)
    ).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(f" burst{e}")).alias("text"),
        "lang",
        "source",
        F.lit("u").alias("op"),
    )
    before = idx._overlay_rows
    idx.apply_cdc(batch)
    fired = idx._overlay_rows < before  # compacted back toward zero
    t = topk_med3()
    print(
        f"epoch {e}  overlay {idx._overlay_rows:>6}  topk {t:.2f}s"
        f"{'  <-- cap fired, overlay folded' if fired else ''}",
        flush=True,
    )
idx.close()
