"""Scratch: capture .explain("formatted") for every headline query into
plans/r13/<query>_<tag>.txt (tag = before/after, argv[1]).

Plan-only: builds each DataFrame and formats its plan — no actions are
executed except where a query function itself runs actions to build
held state (lifecycle queries); those run at sf0.001 to keep this
cheap while the PLAN SHAPE (what the files document) is sf-independent.
"""
import os
import sys
import traceback

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(_REPO, "plans", "r13")
os.makedirs(OUT, exist_ok=True)

from pgsync_spark import get_spark  # noqa: E402
from pgsync_spark import caching  # noqa: E402
from pgsync_spark.queries import REGISTRY  # noqa: E402

# the bench's headline list is the judged surface
sys.path.insert(0, _REPO)
from bench import HEADLINE  # noqa: E402

spark = get_spark("capture_plans")

for name in HEADLINE:
    if ONLY is not None and name not in ONLY:
        continue
    if name not in REGISTRY:
        continue
    path = os.path.join(OUT, f"{name}_{TAG}.txt")
    try:
        df = REGISTRY[name].fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(path, "w") as f:
            f.write(plan)
        caching.release(df)
        print(f"ok {name}", flush=True)
    except Exception:
        with open(path, "w") as f:
            f.write("ERROR\n" + traceback.format_exc())
        print(f"ERR {name}", flush=True)

print("done")
