"""Scratch: py4j round-trip count per construction leg of ann_recall_eval.

Counts send_command invocations around each method-frame build, warm
(trained memo + reader cache hit), by monkeypatching the client's
send_command. Round-trip COUNT is ambient-noise-immune.
"""
import sys
import time

import py4j.clientserver as cs

from pgsync_spark import caching, get_spark, Catalog
from pgsync_spark.functions import similarity as S

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark("recall-leg-rt")
df = Catalog(spark, SF).df("embeddings")

counter = {"n": 0}
orig = cs.ClientServerConnection.send_command

def patched(self, *a, **kw):
    counter["n"] += 1
    return orig(self, *a, **kw)

cs.ClientServerConnection.send_command = patched

def measure(label, fn, warm=True):
    if warm:
        r = fn()
        caching.release(r) if r is not None else None
    counter["n"] = 0
    t0 = time.perf_counter()
    r = fn()
    wall = time.perf_counter() - t0
    print(f"{label:28s} rt {counter['n']:5d}  wall {wall*1000:6.0f} ms")
    if r is not None:
        caching.release(r)
    return r

measure("bruteforce(exact)", lambda: S.ann_bruteforce_topk(df))
pq = S._pq_artifacts(df)
measure("_pq_artifacts", lambda: S._pq_artifacts(df) and None)
pqt = S._pq_trained_artifacts(df)
measure("_pq_trained_artifacts", lambda: S._pq_trained_artifacts(df) and None)
ranked = S._ivf_ranked(df).persist()
measure("_ivf_ranked", lambda: S._ivf_ranked(df))
tranked = S.ivf_assign_trained(df).persist()
measure("ivf_assign_trained", lambda: S.ivf_assign_trained(df))
measure("ann_ivf_topk", lambda: S.ann_ivf_topk(df, ranked=ranked))
measure("ann_ivf_trained_topk", lambda: S.ann_ivf_trained_topk(df, ranked=tranked))
measure("ann_lsh_topk", lambda: S.ann_lsh_topk(df))
measure("ann_lsh_multiprobe_topk", lambda: S.ann_lsh_multiprobe_topk(df))
measure("lsh_multiprobe2", lambda: S.ann_lsh_multiprobe_topk(df, 2))
measure("ann_pq_adc_topk", lambda: S.ann_pq_adc_topk(df, shared=pq))
measure("ann_pq_adc_trained_topk", lambda: S.ann_pq_adc_trained_topk(df, shared=pqt))
measure("ann_ivfpq_trained_topk", lambda: S.ann_ivfpq_trained_topk(df, shared=pqt, ranked=ranked))
measure("ann_ivfpq_fully_trained", lambda: S.ann_ivfpq_fully_trained_topk(df, shared=pqt, ranked=tranked))
measure("ann_ivfpq_topk", lambda: S.ann_ivfpq_topk(df, shared=pq, ranked=ranked))
measure("FULL ann_recall_eval", lambda: S.ann_recall_eval(df))
