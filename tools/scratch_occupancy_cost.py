"""Measure the rebuild-policy check's per-batch cost, r12 vs r13
design, at an sf0.1-scale corpus (150k vectors) — the number behind
round 13's headline claim.

r12: `VectorIndexMaintainer._imbalance` ran the exact scan
(live_cell_counts: full keys scan, overlay folded, map-side combine)
after EVERY applied batch once `rebuild_when` was armed.
r13: the check reads the index's incremental counters — a driver-side
dict. This script builds an IVF index over N hash-featurized vectors,
applies a small CDC batch (so the overlay-fold branch of the scan is
exercised, as a mid-stream check would be), and times:

  - scan_ms:     median live_cell_counts() wall (the r12 per-batch cost;
                 grows O(live keys) — at 10^10 vectors it IS the epoch)
  - counter_ms:  median occupancy_counts read + imbalance (r13 cost;
                 O(cells), corpus-size-independent)
  - apply_overhead_ms: apply_cdc wall with tracking armed minus
                 unarmed (the one batch-sized agg _append adds)

Usage: python scratch_occupancy_cost.py [n_vectors] (default 150000).
Prints one JSON line.
"""

from __future__ import annotations

import json
import statistics
import sys
import time


def main() -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from pgsync_spark import get_spark
    from pgsync_spark.functions.hashing import (
        hash_embed_py,
        hash_embed_sparksql,
    )
    from pgsync_spark.functions.vector_index import IVFVectorIndex

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    spark = get_spark("occupancy-cost")
    corpus = spark.range(n).selectExpr(
        "id AS vec_id",
        f"CAST(({hash_embed_sparksql('CAST(id AS STRING)')}) "
        "AS ARRAY<DOUBLE>) AS embedding",
    )

    def cdc_batch(tag: str):
        return spark.createDataFrame(
            [
                (n + i, hash_embed_py(f"{tag}-{i}"), "u")
                for i in range(50)
            ],
            "vec_id bigint, embedding array<double>, op string",
        )

    def timed(fn, reps=5):
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            walls.append((time.perf_counter() - t0) * 1000)
        return round(statistics.median(walls), 4)

    # both twins built up front; warmup batch applied to EACH before
    # the measured batches (JIT/codegen warmup order otherwise
    # dominates the comparison)
    idx0 = IVFVectorIndex(spark)
    idx0.ingest(corpus)
    idx = IVFVectorIndex(spark)
    idx.enable_occupancy_tracking()
    idx.ingest(corpus)
    idx0.apply_cdc(cdc_batch("warm-plain"))
    idx.apply_cdc(cdc_batch("warm-tracked"))
    apply_plain_ms = timed(
        lambda: idx0.apply_cdc(cdc_batch(f"p{time.monotonic_ns()}")),
        reps=3,
    )
    apply_tracked_ms = timed(
        lambda: idx.apply_cdc(cdc_batch(f"t{time.monotonic_ns()}")),
        reps=3,
    )
    idx0.close()

    scan_ms = timed(lambda: idx.live_cell_counts())
    counter_ms = timed(
        lambda: type(idx).occupancy_imbalance(idx.occupancy_counts),
        reps=200,
    )
    # sanity: with only the 50-row overlay un-folded, the two forms
    # agree on the statistic to within the envelope drift
    exact = type(idx).occupancy_imbalance(idx.live_cell_counts())
    tracked = type(idx).occupancy_imbalance(idx.occupancy_counts)
    print(
        json.dumps(
            {
                "n_vectors": n,
                "scan_ms": scan_ms,
                "counter_ms": counter_ms,
                "speedup": round(scan_ms / max(counter_ms, 1e-4), 0),
                "apply_plain_ms": round(apply_plain_ms, 1),
                "apply_tracked_ms": round(apply_tracked_ms, 1),
                "apply_overhead_ms": round(
                    apply_tracked_ms - apply_plain_ms, 1
                ),
                "imbalance_exact": round(exact, 4),
                "imbalance_tracked": round(tracked, 4),
            }
        )
    )
    idx.close()
    spark.stop()


if __name__ == "__main__":
    main()
