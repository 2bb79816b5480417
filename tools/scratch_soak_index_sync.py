"""Soak of the engine-owned search-index maintenance path (r9): N CDC
batches of relational events (updates + deletes + inserts on `orders`)
through IncrementalEngine with a SearchIndexMaintainer-driven
BM25Index, at sf0.1.

Claims under test:
  1. per-batch wall stays flat as CDC history accumulates — the
     maintenance delta is O(batch) (projections over the engine
     batch's own checkpoints + one apply_cdc epoch), and the index's
     overlay_cap auto-compaction bounds the fold.
  2. the maintained index stays CORRECT under soak: after every batch
     the planted query's top-k hash-matches a one-shot BM25Index
     built fresh from docs_for_sink() (the engine's own store is the
     ground truth the denorm oracles already verify).
  3. topk latency follows the compaction sawtooth (climbs with
     per-batch segments, resets at the maintainer's compact_every
     cadence), never a monotone climb.

Usage: python scratch_soak_index_sync.py [n_batches] (prints one JSON
line; paste the table into EXPLAIN.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 6
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TEXT_EXPR = "get_json_object(doc, '$.o_orderpriority')"


def main() -> None:
    from pyspark.sql import functions as F

    from pgsync_spark import Catalog, get_spark, schemas
    from pgsync_spark.functions.bm25_index import BM25Index
    from pgsync_spark.streaming import (
        IncrementalEngine,
        SearchIndexMaintainer,
        payloads_from_rows,
    )

    spark = get_spark("soak-index-sync")
    cat = Catalog(spark, SF_DIR)
    tree = schemas.tree("orders_full")
    eng = IncrementalEngine(spark, tree, cat)
    t0 = time.perf_counter()
    eng.full_sync()
    full_s = time.perf_counter() - t0
    idx = BM25Index(spark)
    m = SearchIndexMaintainer(idx, text_expr=TEXT_EXPR, compact_every=3)
    t0 = time.perf_counter()
    m.seed(eng.docs_for_sink())
    seed_s = time.perf_counter() - t0
    eng.doc_consumers.append(m)

    orders = cat.df("orders")
    n_orders = orders.count()

    def batch_events(k: int) -> list[dict]:
        """~600 updates + ~150 deletes + 50 inserts per batch. Update
        keys exclude EVERY batch's delete residues (not just this
        batch's), so no batch ever updates a row a prior batch
        deleted — the soak tests the intended mix, not accidental
        update-resurrection (review pass 3)."""
        upd = orders.filter(
            (F.col("o_orderkey") % 251 == k)
            & (F.col("o_orderkey") % 997 >= N_BATCHES)
        ).collect()
        dele = (
            orders.filter(F.col("o_orderkey") % 997 == k)
            .select("o_orderkey")
            .collect()
        )
        ev = []
        for r in upd:
            d = r.asDict()
            ev.append(
                {
                    "op": "UPDATE",
                    "table": "orders",
                    "old": {"o_orderkey": d["o_orderkey"]},
                    "new": dict(d, o_orderpriority=f"soak{k}-term"),
                    "txid": 10 * k + 1,
                }
            )
        for r in dele:
            ev.append(
                {
                    "op": "DELETE",
                    "table": "orders",
                    "old": {"o_orderkey": r["o_orderkey"]},
                    "txid": 10 * k + 2,
                }
            )
        for i in range(50):
            ev.append(
                {
                    "op": "INSERT",
                    "table": "orders",
                    "new": {
                        "o_orderkey": 20_000_000 + 100 * k + i,
                        "o_custkey": 1,
                        "o_orderstatus": "N",
                        "o_totalprice": 1.0,
                        "o_orderdate": "2025-01-01 00:00:00",
                        "o_orderpriority": f"soak{k}-term",
                    },
                    "txid": 10 * k + 3,
                }
            )
        return ev

    def oneshot_topk(terms):
        ref = BM25Index(spark)
        ref.ingest(
            eng.docs_for_sink().selectExpr(
                "CAST(_id AS BIGINT) AS doc_id",
                f"{TEXT_EXPR} AS text",
                "CAST(NULL AS STRING) AS lang",
                "CAST(NULL AS STRING) AS source",
            )
        )
        out = [tuple(r) for r in ref.topk(terms, k=10).collect()]
        ref.close()
        return out

    rows = []
    walls, qs = [], []
    for k in range(N_BATCHES):
        ev = batch_events(k)
        t0 = time.perf_counter()
        eng.process_batch(payloads_from_rows(spark, ev))
        wall = time.perf_counter() - t0
        terms = (f"soak{k}-term",)
        t0 = time.perf_counter()
        got = [tuple(r) for r in idx.topk(terms, k=10).collect()]
        q = time.perf_counter() - t0
        want = oneshot_topk(terms)
        ok = got == want
        walls.append(wall)
        qs.append(q)
        rows.append(
            {
                "batch": k,
                "events": len(ev),
                "wall_s": round(wall, 2),
                "topk_s": round(q, 2),
                "parity": ok,
            }
        )
        print(
            f"batch {k}: {len(ev)} events, wall {wall:.2f}s, "
            f"topk {q:.2f}s, parity {'OK' if ok else 'FAIL'}",
            flush=True,
        )
        assert ok, f"parity FAILED at batch {k}"
    out = {
        "sf_dir": SF_DIR,
        "n_orders": n_orders,
        "full_sync_s": round(full_s, 2),
        "seed_s": round(seed_s, 2),
        "batches": rows,
        "wall_late_over_early": round(
            sum(walls[-2:]) / max(sum(walls[:2]), 1e-9), 2
        ),
        "topk_late_over_early": round(
            sum(qs[-2:]) / max(sum(qs[:2]), 1e-9), 2
        ),
    }
    print(json.dumps(out))
    idx.close()
    eng._teardown_stores()


if __name__ == "__main__":
    main()
