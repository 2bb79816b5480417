"""Scratch A/B: bm25_cdc_topk / bm25_incremental_topk with the df
aggregate sourced from the candidate pivot (current — evaluates the
groupBy subtree twice) vs from the pruned postings slice directly
(sum(term=t AND tf>0) — the identity the r13 verdict asserted:
one live posting per (doc, term)). Interleaved runs, same session,
rows must be byte-identical."""
import sys
import time

from pgsync_spark import get_spark, caching
from pgsync_spark.functions import bm25_index as BI
from pgsync_spark.queries import REGISTRY

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4

spark = get_spark("ab-bm25-df")

_orig_sql = BI.BM25Index._topk_sql


def _topk_sql_sl(self, terms, k):
    from pgsync_spark.operators.filters import _spark_sql_str as _sq

    text = _orig_sql(self, terms, k)
    # rebuild the dfs subquery over sl instead of cand
    kview, kcols = self._parts_view("keys")
    bands = sorted({BI._band_of(t) for t in terms})
    in_bands = ", ".join(str(b) for b in bands)
    in_terms = ", ".join(_sq(t) for t in terms)
    sl = (
        f"(SELECT * FROM {kview} WHERE band IN ({in_bands}) "
        f"AND term IN ({in_terms}))"
    )
    if self._has_cdc:
        sl = f"({self._cdc_live_sql(sl, kcols)})"
    tfs = ",\n  ".join(
        f"coalesce(max(CASE WHEN (term = {_sq(t)}) THEN tf END), "
        f"CAST(0 AS BIGINT)) AS tf{i}"
        for i, t in enumerate(terms)
    )
    cand = (
        f"(SELECT doc_id, dl,\n  {tfs}\n  FROM {sl} "
        f"GROUP BY doc_id, dl)"
    )
    dfs_cand = ", ".join(
        f"sum(CAST((tf{i} > 0) AS BIGINT)) AS df{i}"
        for i in range(len(terms))
    )
    old = f"(SELECT {dfs_cand} FROM {cand})"
    dfs_sl = ", ".join(
        f"sum(CASE WHEN term = {_sq(t)} AND tf > 0 THEN CAST(1 AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END) AS df{i}"
        for i, t in enumerate(terms)
    )
    new = f"(SELECT {dfs_sl} FROM {sl})"
    assert old in text, "old dfs subquery not found in SQL text"
    return text.replace(old, new)


def run(name):
    fn = REGISTRY[name].fn
    t0 = time.perf_counter()
    df = fn(spark, SF)
    rows = df.collect()
    dt = time.perf_counter() - t0
    caching.release(df)
    return dt, sorted(tuple(r) for r in rows)


for name in ("bm25_cdc_topk", "bm25_incremental_topk"):
    base_rows = None
    for i in range(N):
        BI.BM25Index._topk_sql = _orig_sql
        t_a, rows_a = run(name)
        BI.BM25Index._topk_sql = _topk_sql_sl
        t_b, rows_b = run(name)
        assert rows_a == rows_b, f"{name}: ROWS DIFFER"
        if base_rows is None:
            base_rows = rows_a
        print(f"{name} round {i}: cand-df {t_a:.3f}s  sl-df {t_b:.3f}s  rows {len(rows_a)}")
BI.BM25Index._topk_sql = _orig_sql
