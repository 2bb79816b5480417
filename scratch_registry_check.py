"""Pre-snapshot gate: oracle-check EVERY registry query at sf0.01.

The driver samples ~50 of the registry; this loop covers all of it so an
unsampled query can never ship unvalidated (VERDICT r2 item 9). Queries
without an oracle get a rows-only check (runs, returns >= 0 rows).

Usage: python scratch_registry_check.py [name ...] [--sf DIR]
Exit code 1 if anything fails.
"""

import sys
import time

from pgsync_spark import get_spark
from pgsync_spark.queries import REGISTRY
from pgsync_spark.testing import compare
from pgsync_spark import caching

SF = "/root/testdata/sf0.01"
args = [a for a in sys.argv[1:] if not a.startswith("--")]
if "--sf" in sys.argv:
    SF = sys.argv[sys.argv.index("--sf") + 1]
names = args or list(REGISTRY)

spark = get_spark("registry-check")
failed = []
for name in names:
    qd = REGISTRY[name]
    t0 = time.perf_counter()
    try:
        df = qd.fn(spark, SF)
        if qd.oracle is None:
            n = df.count()
            ok, msg = True, f"rows-only ({n} rows)"
        else:
            ok, msg = compare(df, qd.oracle, SF)
        caching.release(df)
    except Exception as e:
        ok, msg = False, f"EXC: {type(e).__name__}: {e}"
    dt = time.perf_counter() - t0
    print(f"{'PASS' if ok else 'FAIL'} {name}: {msg[:1500]} [{dt:.1f}s]", flush=True)
    if not ok:
        failed.append(name)

caching.release_all()
spark.catalog.clearCache()
print(f"\n{len(names) - len(failed)}/{len(names)} green" + (f"; FAILED: {failed}" if failed else ""))
sys.exit(1 if failed else 0)
