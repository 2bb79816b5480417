"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is executed to completion
with a count-style action (no driver-side collect of full results).
"""

from __future__ import annotations

import json
import os
import sys
import time


HEADLINE = [
    "denorm_orders_full",
    "denorm_orders_lineitems",
    "denorm_supplier_parts_through",
    "agg_pricing_summary",
    "agg_revenue_by_order",
    "join_fk_broadcast",
    "topk_per_group",
    "events_hourly_rollup",
    "text_stats",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "ann_bruteforce_topk",
    "multimodal_extract",
    "events_sessionize",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pgsync_spark import get_spark
    from pgsync_spark import caching
    from pgsync_spark.queries import REGISTRY

    spark = get_spark("bench")
    # warm up the JVM / codegen / parquet footer cache so the first timed
    # query doesn't absorb session startup cost
    spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).count()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in REGISTRY:
            continue
        fn = REGISTRY[name].fn
        # warm the input cache path once so timings measure compute, and
        # run the real measurement on a fresh plan
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
        # release intermediates the query persisted for multi-consumer
        # stages (dedup signatures etc.) now that the action is done
        caching.release(df)

    caching.release_all()
    spark.catalog.clearCache()  # safety net for anything unregistered

    # incremental engine, timed per phase (initial load vs one CDC batch)
    from pgsync_spark import Catalog, schemas
    from pgsync_spark.queries import _incremental_events
    from pgsync_spark.streaming import IncrementalEngine, payloads_from_rows

    cat = Catalog(spark, sf_dir)
    eng = IncrementalEngine(spark, schemas.tree("orders_full"), cat)
    t0 = time.perf_counter()
    eng.full_sync()
    timings["incremental_full_sync"] = round(time.perf_counter() - t0, 3)
    events = payloads_from_rows(spark, _incremental_events(spark, cat))
    t0 = time.perf_counter()
    eng.process_batch(events)
    timings["incremental_cdc_batch"] = round(time.perf_counter() - t0, 3)
    print(
        f"# incremental: full_sync {timings['incremental_full_sync']}s, "
        f"batch {timings['incremental_cdc_batch']}s ({eng.stats})",
        file=sys.stderr,
    )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
