"""Scratch: BM25Index.topk construction round-trips + wall, serving
shape (index built once, repeated topk) — mirrors bm25_topk_serving."""
import cProfile
import pstats
import sys
import time

from pgsync_spark import get_spark
from pgsync_spark.functions.bm25_index import BM25Index
from pgsync_spark.queries import BM25_QUERY_TERMS

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark("bm25-topk-profile")
docs = spark.read.parquet(f"{SF}/documents.parquet")
bidx = BM25Index(spark)
bidx.ingest(docs)
bidx.topk(BM25_QUERY_TERMS, k=10).count()  # warm

for _ in range(3):
    t0 = time.perf_counter()
    df = bidx.topk(BM25_QUERY_TERMS, k=10)
    t1 = time.perf_counter()
    df.count()
    t2 = time.perf_counter()
    print(f"construct {1000*(t1-t0):.0f} ms  total {1000*(t2-t0):.0f} ms")

pr = cProfile.Profile()
pr.enable()
bidx.topk(BM25_QUERY_TERMS, k=10)
pr.disable()
st = pstats.Stats(pr)
for (filename, _l, name), stat in st.stats.items():
    if name == "send_command" and "java_gateway" in filename:
        print("construction round-trips:", stat[0])
bidx.close()
