"""Pre-snapshot gate: oracle-check EVERY registry query at sf0.01.

The driver samples ~50 of the registry; this loop covers all of it so an
unsampled query can never ship unvalidated (VERDICT r2 item 9). Queries
without an oracle get a rows-only check (runs, returns >= 0 rows).

Usage: python scratch_registry_check.py [name ...] [--sf DIR] [--json PATH]
Exit code 1 if anything fails. With --json, a machine-readable artifact
(one row per query: oracle vs rows-only, pass/fail, row count, seconds)
is written for committing as VALIDATE_r{N}.json — the driver samples
only ~50 queries, so this is the official full-coverage evidence
(VERDICT r5 item 5).
"""

import argparse
import json
import re
import sys
import time

from pgsync_spark import get_spark
from pgsync_spark.queries import REGISTRY
from pgsync_spark.testing import compare
from pgsync_spark import caching

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("names", nargs="*", help="registry queries (default: all)")
parser.add_argument("--sf", default="/root/testdata/sf0.01", dest="sf_dir")
parser.add_argument("--json", dest="json_path", default=None,
                    help="write the gate result as a JSON artifact")
opts = parser.parse_args()
SF = opts.sf_dir
json_path = opts.json_path
names = opts.names or list(REGISTRY)

spark = get_spark("registry-check")
failed = []
results = {}
for name in names:
    qd = REGISTRY[name]
    t0 = time.perf_counter()
    n = None
    try:
        df = qd.fn(spark, SF)
        if qd.oracle is None:
            n = df.count()
            ok, msg = True, f"rows-only ({n} rows)"
        else:
            ok, msg = compare(df, qd.oracle, SF)
            m = re.search(r"(\d+) rows", msg or "")
            n = int(m.group(1)) if m else None
        caching.release(df)
    except Exception as e:
        ok, msg = False, f"EXC: {type(e).__name__}: {e}"
    dt = time.perf_counter() - t0
    print(f"{'PASS' if ok else 'FAIL'} {name}: {msg[:1500]} [{dt:.1f}s]", flush=True)
    results[name] = {
        "ok": bool(ok),
        "check": "rows_only" if qd.oracle is None else "oracle",
        "rows": n,
        "sec": round(dt, 2),
        **({} if ok else {"msg": (msg or "")[:500]}),
    }
    if not ok:
        failed.append(name)

caching.release_all()
spark.catalog.clearCache()
if json_path:
    summary = {
        "sf_dir": SF,
        "total": len(names),
        "passed": len(names) - len(failed),
        "failed": failed,
        "with_oracle": sum(1 for r in results.values() if r["check"] == "oracle"),
        "queries": results,
    }
    with open(json_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"wrote {json_path}")
print(f"\n{len(names) - len(failed)}/{len(names)} green" + (f"; FAILED: {failed}" if failed else ""))
sys.exit(1 if failed else 0)
