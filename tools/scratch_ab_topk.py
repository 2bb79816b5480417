"""A/B in ONE session: Column topk (_topk_df) vs one-SQL topk, warm,
interleaved — construction and total, 5 reps each."""
import sys, time
from pyspark.sql import functions as F
from pgsync_spark import get_spark
from pgsync_spark.functions.vector_index import VectorIndex
from pgsync_spark.functions.bm25_index import BM25Index
from pgsync_spark.functions.similarity import N_QUERIES
from pgsync_spark.queries import BM25_QUERY_TERMS

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("ab-topk")
emb = spark.read.parquet(f"{SF}/embeddings.parquet")
docs = spark.read.parquet(f"{SF}/documents.parquet")
vidx = VectorIndex(spark); vidx.ingest(emb)
bidx = BM25Index(spark); bidx.ingest(docs)
q = emb.filter(F.col("vec_id") < N_QUERIES).select(F.col("vec_id").alias("query_id"), "embedding")

def rep(label, fn):
    fn()  # warm
    cs, ts = [], []
    for _ in range(5):
        t0 = time.perf_counter(); df = fn(); t1 = time.perf_counter()
        df.count(); t2 = time.perf_counter()
        cs.append(t1-t0); ts.append(t2-t0)
    print(f"{label}: construct {sorted(cs)[2]*1000:.0f}ms total {sorted(ts)[2]*1000:.0f}ms  (all totals {[round(x,2) for x in ts]})")

rep("vec OLD", lambda: vidx._topk_df(q, 10, True))
rep("vec NEW", lambda: vidx.topk(q, exclude_self=True))
rep("vec OLD", lambda: vidx._topk_df(q, 10, True))
rep("vec NEW", lambda: vidx.topk(q, exclude_self=True))
rep("bm OLD", lambda: bidx._topk_df(BM25_QUERY_TERMS, 10))
rep("bm NEW", lambda: bidx.topk(BM25_QUERY_TERMS, k=10))
rep("bm OLD", lambda: bidx._topk_df(BM25_QUERY_TERMS, 10))
rep("bm NEW", lambda: bidx.topk(BM25_QUERY_TERMS, k=10))
vidx.close(); bidx.close()
