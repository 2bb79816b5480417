"""Soak of the engine-owned TRAINED-vector-index maintenance path with
a MID-SOAK REBUILD (r11): N CDC batches of relational events through
IncrementalEngine with a VectorIndexMaintainer-driven IVFVectorIndex at
sf0.1 — the trained twin of scratch_soak_vector_sync.py.

Claims under test:
  1. per-batch wall stays flat as CDC history accumulates (the
     maintenance delta is O(batch); assignment under the frozen
     codebook is one Arrow pass over the batch).
  2. the maintained index stays CORRECT under soak: after every batch
     the planted query vector's top-k hash-matches a one-shot
     IVFVectorIndex built fresh from docs_for_sink() under the SAME
     codebook (the maintained contract — a fresh training is a
     different, equally-legal index), with every hit cosine 1.0.
  3. rebuild() mid-soak: retrains over the live corpus, the codebook
     MOVES, the overlay folds to zero, and every subsequent batch's
     parity holds under the NEW geometry (the baseline copies the
     index's current centroids each batch, so it follows the flip).

Usage: python scratch_soak_ivf_sync.py [n_batches] (prints one JSON
line; paste the table into EXPLAIN.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 6
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
VEC_TEXT = "get_json_object(doc, '$.o_orderpriority')"


def main() -> None:
    from pyspark.sql import functions as F

    from pgsync_spark import Catalog, get_spark, schemas
    from pgsync_spark.functions.hashing import (
        hash_embed_py,
        hash_embed_sparksql,
    )
    from pgsync_spark.functions.vector_index import IVFVectorIndex
    from pgsync_spark.streaming import (
        IncrementalEngine,
        VectorIndexMaintainer,
        payloads_from_rows,
    )

    spark = get_spark("soak-ivf-sync")
    cat = Catalog(spark, SF_DIR)
    tree = schemas.tree("orders_full")
    eng = IncrementalEngine(spark, tree, cat)
    t0 = time.perf_counter()
    eng.full_sync()
    full_s = time.perf_counter() - t0
    idx = IVFVectorIndex(spark)
    vec_expr = hash_embed_sparksql(VEC_TEXT)
    m = VectorIndexMaintainer(idx, vec_expr=vec_expr, compact_every=3)
    t0 = time.perf_counter()
    m.seed(eng.docs_for_sink())  # trains + freezes the codebook
    seed_s = time.perf_counter() - t0
    seed_cents = [row[:] for row in idx._cents]
    eng.doc_consumers.append(m)

    orders = cat.df("orders")
    n_orders = orders.count()

    def batch_events(k: int) -> list[dict]:
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

    def qframe(k: int):
        return spark.createDataFrame(
            [(0, hash_embed_py(f"soak{k}-term"))],
            "query_id bigint, embedding array<double>",
        )

    def oneshot_topk(k: int):
        """Fresh IVF index over the current docs under the SAME
        (current) codebook — the maintained contract's baseline."""
        ref = IVFVectorIndex(spark)
        ref._cents = [row[:] for row in idx._cents]
        ref.ingest(
            eng.docs_for_sink().selectExpr(
                "CAST(_id AS BIGINT) AS vec_id",
                f"{vec_expr} AS embedding",
            )
        )
        out = [
            tuple(r)
            for r in ref.topk(qframe(k), k=10)
            .orderBy("rank")
            .collect()
        ]
        ref.close()
        return out

    rebuild_at = N_BATCHES // 2
    rows = []
    walls, qs = [], []
    rebuild_s = None
    for k in range(N_BATCHES):
        ev = batch_events(k)
        t0 = time.perf_counter()
        eng.process_batch(payloads_from_rows(spark, ev))
        wall = time.perf_counter() - t0
        if k == rebuild_at:
            t0 = time.perf_counter()
            idx.rebuild()
            rebuild_s = round(time.perf_counter() - t0, 2)
            assert idx._rebuilds == 1
            assert idx._has_cdc is False and idx._overlay_rows == 0
            assert idx._cents != seed_cents, "rebuild must move the codebook"
        t0 = time.perf_counter()
        got = [
            tuple(r)
            for r in idx.topk(qframe(k), k=10).orderBy("rank").collect()
        ]
        q = time.perf_counter() - t0
        want = oneshot_topk(k)
        ok = got == want and got and all(t[2] == 1.0 for t in got)
        walls.append(wall)
        qs.append(q)
        rows.append(
            {
                "batch": k,
                "events": len(ev),
                "wall_s": round(wall, 2),
                "topk_s": round(q, 2),
                "rebuilt": k == rebuild_at,
                "parity": ok,
            }
        )
        print(
            f"batch {k}: {len(ev)} events, wall {wall:.2f}s, "
            f"topk {q:.2f}s"
            + (f", REBUILD {rebuild_s}s" if k == rebuild_at else "")
            + f", parity {'OK' if ok else 'FAIL'}",
            flush=True,
        )
        assert ok, f"parity FAILED at batch {k}"
    out = {
        "sf_dir": SF_DIR,
        "n_orders": n_orders,
        "full_sync_s": round(full_s, 2),
        "seed_train_s": round(seed_s, 2),
        "rebuild_s": rebuild_s,
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
    spark.stop()


if __name__ == "__main__":
    main()
