"""Soak of the AUTOMATIC rebuild policy (r12, VERDICT r11 item 2):
N CDC batches of relational events through IncrementalEngine with a
VectorIndexMaintainer-driven IVFVectorIndex whose ``rebuild_when``
imbalance threshold is armed — the policy twin of
scratch_soak_ivf_sync.py (where the mid-soak rebuild was explicit).

The maintained vectors use the CLUSTERED featurizer
(hashing.cluster_embed_sparksql over the doc's priority field), so
cell occupancy tracks real mode structure. Mid-soak, one batch
injects drift: a burst of inserted docs whose priority texts all hash
to ONE mode the codebook never saw — the cell imbalance spikes past
the threshold and the policy must fire EXACTLY ONE rebuild, logged,
counted in the manifest, with per-batch topk parity holding across
the flip (the baseline copies the index's current centroids each
batch, so it follows the retrain).

Claims under test:
  1. exactly one policy rebuild fires across the soak (the drift
     batch trips it; the post-rebuild imbalance floor prevents
     thrash on every later batch).
  2. per-batch topk parity vs a fresh IVF index under the SAME
     current codebook holds on every batch, including the one that
     rebuilt mid-apply.
  3. the manifest ``rebuilds`` counter lands at 1 (durable).

Usage: python scratch_soak_rebuild_policy.py [n_batches] [threshold]
(default 6 batches, threshold 1.8; prints one JSON line).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 6
THRESHOLD = float(sys.argv[2]) if len(sys.argv) > 2 else 1.8
# sf0.001 by default: the policy dynamics (mode crowding vs
# threshold) are scale-free, and the O(batch)/O(corpus) scale story
# is already soaked by scratch_soak_ivf_sync.py at sf0.1
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
VEC_TEXT = "get_json_object(doc, '$.o_orderpriority')"
DRIFT_AT = 2  # the batch that injects the hot unseen mode


def main() -> None:
    from pyspark.sql import functions as F

    from pgsync_spark import Catalog, get_spark, schemas
    from pgsync_spark.functions.hashing import (
        cluster_center_py,
        cluster_embed_py,
        cluster_embed_sparksql,
    )
    from pgsync_spark.functions.vector_index import IVFVectorIndex
    from pgsync_spark.streaming import (
        IncrementalEngine,
        VectorIndexMaintainer,
        payloads_from_rows,
    )

    logging.basicConfig(level=logging.INFO)

    spark = get_spark("soak-rebuild-policy")
    cat = Catalog(spark, SF_DIR)
    tree = schemas.tree("orders_full")
    eng = IncrementalEngine(spark, tree, cat)
    eng.full_sync()
    idx = IVFVectorIndex(spark)
    vec_expr = cluster_embed_sparksql(VEC_TEXT)
    m = VectorIndexMaintainer(
        idx, vec_expr=vec_expr, compact_every=3, rebuild_when=THRESHOLD
    )
    m.seed(eng.docs_for_sink())
    seed_cents = [row[:] for row in idx._cents]
    eng.doc_consumers.append(m)

    orders = cat.df("orders")
    n_orders = orders.count()

    # the injected drift: a burst of docs from one mode the codebook
    # never saw. The synthetic mode centers are near-orthogonal, so a
    # RANDOM unseen mode would spread evenly over the stale cells and
    # hide from the imbalance signal — real encoder modes live on a
    # correlated manifold and crowd their nearest centroid, so pick
    # the unseen mode whose members crowd an existing cell hardest
    # (driver-side, via the mirrored python featurizer): mode 0,
    # 71% of whose members land in 5-LOW's cell under the seed
    # codebook (measured; see the r12 EXPLAIN note)
    import numpy as _np

    pris = [
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    ]
    pnorm = [
        _np.asarray(v) / _np.linalg.norm(v)
        for v in (cluster_embed_py(t) for t in pris)
    ]
    seen = {cluster_center_py(t) for t in pris}
    best_mode, best_crowd = None, -1.0
    for mm in range(10):
        if mm in seen:
            continue
        members, j = [], 0
        while len(members) < 120:
            t = f"drift{j}"
            if cluster_center_py(t) == mm:
                members.append(t)
            j += 1
        counts = _np.zeros(len(pnorm))
        for t in members:
            v = _np.asarray(cluster_embed_py(t))
            v = v / _np.linalg.norm(v)
            counts[int(_np.argmax([v @ c for c in pnorm]))] += 1
        crowd = counts.max() / len(members)
        if crowd > best_crowd:
            best_mode, best_crowd = mm, crowd
    hot_mode = best_mode
    hot_texts: list[str] = []
    j = 0
    while len(hot_texts) < 1200:
        t = f"drift{j}"
        if cluster_center_py(t) == hot_mode:
            hot_texts.append(t)
        j += 1

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
        texts = (
            hot_texts
            if k == DRIFT_AT
            else [f"soak{k}-{i}" for i in range(50)]
        )
        for i, t in enumerate(texts):
            ev.append(
                {
                    "op": "INSERT",
                    "table": "orders",
                    "new": {
                        "o_orderkey": 20_000_000 + 1000 * k + i,
                        "o_custkey": 1,
                        "o_orderstatus": "N",
                        "o_totalprice": 1.0,
                        "o_orderdate": "2025-01-01 00:00:00",
                        "o_orderpriority": t,
                    },
                    "txid": 10 * k + 3,
                }
            )
        return ev

    def qframe(k: int):
        t = hot_texts[0] if k == DRIFT_AT else f"soak{k}-0"
        return spark.createDataFrame(
            [(0, cluster_embed_py(t))],
            "query_id bigint, embedding array<double>",
        )

    def oneshot_topk(k: int):
        """Fresh IVF index over the current docs under the SAME
        (current) codebook — follows the policy flip because it
        copies the live centroids each batch."""
        ref = IVFVectorIndex(spark)
        ref._cents = [row[:] for row in idx._cents]
        ref.ingest(
            eng.docs_for_sink().selectExpr(
                "CAST(_id AS BIGINT) AS vec_id",
                f"CAST(({vec_expr}) AS ARRAY<DOUBLE>) AS embedding",
            )
        )
        out = [
            tuple(r)
            for r in ref.topk(qframe(k), k=10).orderBy("rank").collect()
        ]
        ref.close()
        return out

    rows = []
    for k in range(N_BATCHES):
        ev = batch_events(k)
        t0 = time.perf_counter()
        eng.process_batch(payloads_from_rows(spark, ev))
        wall = time.perf_counter() - t0
        imb = m._imbalance()
        got = [
            tuple(r)
            for r in idx.topk(qframe(k), k=10).orderBy("rank").collect()
        ]
        want = oneshot_topk(k)
        ok = got == want and got and got[0][2] == 1.0
        rows.append(
            {
                "batch": k,
                "events": len(ev),
                "wall_s": round(wall, 2),
                "imbalance": round(imb, 2) if imb else None,
                "policy_rebuilds": m.policy_rebuilds,
                "parity": ok,
            }
        )
        print(
            f"batch {k}: {len(ev)} events, wall {wall:.2f}s, "
            f"imb {imb:.2f}, policy_rebuilds {m.policy_rebuilds}, "
            f"parity {'OK' if ok else 'FAIL'}",
            flush=True,
        )
        assert ok, f"parity FAILED at batch {k}"

    assert m.policy_rebuilds == 1, (
        f"expected exactly one policy rebuild, got {m.policy_rebuilds}"
    )
    assert idx._rebuilds == 1
    assert idx._cents != seed_cents, "the policy rebuild moved the codebook"
    # r13: the policy read INCREMENTAL counters all soak (zero keys
    # scans per batch); at the final compact boundary they must agree
    # with the exact scan-derived statistic
    exact = type(idx).occupancy_imbalance(idx.live_cell_counts())
    counter_drift = abs((m._imbalance() or 0.0) - (exact or 0.0))
    assert counter_drift < 1e-9, (m._imbalance(), exact)
    out = {
        "sf_dir": SF_DIR,
        "n_orders": n_orders,
        "threshold": THRESHOLD,
        "drift_batch": DRIFT_AT,
        "hot_mode": hot_mode,
        "policy_rebuilds": m.policy_rebuilds,
        "manifest_rebuilds": idx._rebuilds,
        "batches": rows,
    }
    print(json.dumps(out))
    idx.close()
    eng._teardown_stores()
    spark.stop()


if __name__ == "__main__":
    main()
