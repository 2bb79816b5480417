"""Capture .explain(formatted) of the index serving topk plans
(BM25Index/VectorIndex, CDC and no-CDC) into plans/r14/."""
import os, sys
TAG = sys.argv[1]
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/plans/r14"
SF = "/root/testdata/sf0.001"
os.makedirs(OUT, exist_ok=True)
from pyspark.sql import functions as F
from pgsync_spark import get_spark
from pgsync_spark.functions.bm25_index import BM25Index
from pgsync_spark.functions.vector_index import VectorIndex
from pgsync_spark.functions.similarity import N_QUERIES
from pgsync_spark.queries import BM25_QUERY_TERMS

spark = get_spark("capture-topk", master="local[8]", shuffle_partitions=8)
docs = spark.read.parquet(f"{SF}/documents.parquet")
emb = spark.read.parquet(f"{SF}/embeddings.parquet")

def dump(name, df):
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as f:
        f.write(plan)
    print("ok", name, flush=True)

b = BM25Index(spark); b.ingest(docs)
dump("bm25_index_topk", b.topk(BM25_QUERY_TERMS, k=10))
cdc = docs.limit(40).select(
    "doc_id", F.concat(F.lit("spark vector updated "), F.col("text")).alias("text"),
    "lang", "source",
    F.when(F.col("doc_id") % 3 == 0, F.lit("d")).otherwise(F.lit("u")).alias("op"))
b.apply_cdc(cdc)
dump("bm25_index_topk_cdc", b.topk(BM25_QUERY_TERMS, k=10))
b.close()

v = VectorIndex(spark); v.ingest(emb)
q = emb.filter(F.col("vec_id") < N_QUERIES).select(F.col("vec_id").alias("query_id"), "embedding")
dump("vector_index_topk", v.topk(q, exclude_self=True))
vc = emb.filter("vec_id >= 5 and vec_id < 25").select(
    "vec_id", F.expr("transform(embedding, x -> -x)").alias("embedding"),
    F.when(F.col("vec_id") < 15, F.lit("u")).otherwise(F.lit("d")).alias("op"))
v.apply_cdc(vc)
dump("vector_index_topk_cdc", v.topk(q, exclude_self=True))
v.close()
print("done")
