"""Scratch: interleaved A/B of the standalone ANN registry queries
with the one-SQL fast paths ON vs OFF, bench methodology (fn+count),
same process/window. Round-trip counts printed first (noise-immune)."""
import statistics
import sys
import time

import py4j.clientserver as cs

from pgsync_spark import caching, get_spark
from pgsync_spark.functions import similarity as S
from pgsync_spark.queries import REGISTRY

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
NAMES = [
    "ann_bruteforce_topk",
    "ann_ivf_trained_topk",
    "ann_pq_adc_topk",
    "ann_pq_adc_trained_topk",
    "ann_ivfpq_topk",
]
spark = get_spark("ab-ann-sql")

counter = {"n": 0}
orig = cs.ClientServerConnection.send_command

def patched(self, *a, **kw):
    counter["n"] += 1
    return orig(self, *a, **kw)

cs.ClientServerConnection.send_command = patched

print("construction round-trips (warm):")
for name in NAMES:
    fn = REGISTRY[name].fn
    for flag in (True, False):
        S._SQL_ANN = flag
        d = fn(spark, SF); caching.release(d)  # warm
        counter["n"] = 0
        d = fn(spark, SF)
        rt = counter["n"]
        caching.release(d)
        print(f"  {name:26s} {'sql' if flag else 'col'} rt {rt:5d}")
S._SQL_ANN = True

def run_once(fn):
    t0 = time.perf_counter()
    df = fn(spark, SF)
    df.count()
    dt = time.perf_counter() - t0
    caching.release(df)
    return dt

print("fn+count A/B (interleaved):")
for name in NAMES:
    fn = REGISTRY[name].fn
    res = {True: [], False: []}
    for flag in (True, False):
        S._SQL_ANN = flag
        run_once(fn)
    for _ in range(ROUNDS):
        for flag in (True, False):
            S._SQL_ANN = flag
            res[flag].append(round(run_once(fn), 3))
    S._SQL_ANN = True
    print(
        f"  {name:26s} sql median {statistics.median(res[True]):.3f} "
        f"(min {min(res[True]):.3f}) | col median "
        f"{statistics.median(res[False]):.3f} (min {min(res[False]):.3f})"
    )
