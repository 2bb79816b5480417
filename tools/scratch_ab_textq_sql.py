"""Scratch: interleaved A/B of text_bm25_topk / hybrid_search_rrf with
the one-SQL construction ON vs OFF, bench methodology, same window."""
import statistics
import sys
import time

import py4j.clientserver as cs

from pgsync_spark import caching, get_spark
import pgsync_spark.queries as Q

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
spark = get_spark("ab-textq-sql")

counter = {"n": 0}
orig = cs.ClientServerConnection.send_command
def patched(self, *a, **kw):
    counter["n"] += 1
    return orig(self, *a, **kw)
cs.ClientServerConnection.send_command = patched

NAMES = ["text_bm25_topk", "hybrid_search_rrf"]
print("construction round-trips (warm):")
for name in NAMES:
    fn = Q.REGISTRY[name].fn
    for flag in (True, False):
        Q._SQL_TEXTQ = flag
        d = fn(spark, SF); caching.release(d)
        counter["n"] = 0
        d = fn(spark, SF)
        print(f"  {name:20s} {'sql' if flag else 'col'} rt {counter['n']:5d}")
        caching.release(d)
Q._SQL_TEXTQ = True

def run_once(fn):
    t0 = time.perf_counter()
    df = fn(spark, SF)
    df.count()
    dt = time.perf_counter() - t0
    caching.release(df)
    return dt

print("fn+count A/B (interleaved):")
for name in NAMES:
    fn = Q.REGISTRY[name].fn
    res = {True: [], False: []}
    for flag in (True, False):
        Q._SQL_TEXTQ = flag
        run_once(fn)
    for _ in range(ROUNDS):
        for flag in (True, False):
            Q._SQL_TEXTQ = flag
            res[flag].append(round(run_once(fn), 3))
    Q._SQL_TEXTQ = True
    print(
        f"  {name:20s} sql median {statistics.median(res[True]):.3f} "
        f"(min {min(res[True]):.3f}) | col median "
        f"{statistics.median(res[False]):.3f} (min {min(res[False]):.3f})"
    )
