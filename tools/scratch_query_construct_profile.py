"""Scratch: per-query DataFrame-CONSTRUCTION cost for registry queries.

For each query name given (default: the multi-second headline paths),
calls REGISTRY[name].fn(spark, sf_dir) WITHOUT any action, measuring
wall time and py4j round-trip count (cProfile of
py4j...send_command) — the round-trip count is immune to ambient
host noise, so it is the adjudication stat on this host.

Lifecycle queries (engine_sync_*, *_cdc_*, incremental_*) run actions
inside fn(); their numbers here mix execution — interpret only the
plain-construction queries.
"""
import cProfile
import pstats
import sys
import time

from pgsync_spark import caching, get_spark
from pgsync_spark.queries import REGISTRY

SF = "/root/testdata/sf0.1"
DEFAULT = [
    "hybrid_search_rrf",
    "text_bm25_topk",
    "ann_recall_eval",
    "dedup_canonical",
    "dedup_minhash_lsh_pairs",
    "dsir_select",
    "ann_bruteforce_topk",
    "ccnet_perplexity_buckets",
    "events_sessionize",
    "topk_per_group",
    "agg_revenue_by_order",
    "plugin_masking_docs",
]

names = sys.argv[1:] or DEFAULT
spark = get_spark("construct-profile")

for name in names:
    fn = REGISTRY[name].fn
    df = fn(spark, SF)  # warm: reader cache, memos
    caching.release(df)
    t0 = time.perf_counter()
    df = fn(spark, SF)
    wall = time.perf_counter() - t0
    caching.release(df)
    pr = cProfile.Profile()
    pr.enable()
    df = fn(spark, SF)
    pr.disable()
    caching.release(df)
    st = pstats.Stats(pr)
    rt = 0
    for (f, l, fname), (cc, nc, tt, ct, callers) in st.stats.items():
        if fname == "send_command" and "java_gateway" in f:
            rt += nc
    print(f"{name:32s} construct {wall*1000:7.0f} ms  py4j_round_trips {rt}")
