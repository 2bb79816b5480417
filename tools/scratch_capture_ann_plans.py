"""Scratch: capture plans/r14/<q>_{before,after}.txt for the standalone
ANN one-SQL fast paths (before = Column via _SQL_ANN off)."""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
OUT = os.path.join(_REPO, "plans", "r14")
os.makedirs(OUT, exist_ok=True)

from pgsync_spark import caching, get_spark  # noqa: E402
from pgsync_spark.functions import similarity as S  # noqa: E402
from pgsync_spark.queries import REGISTRY  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
NAMES = [
    "ann_bruteforce_topk",
    "ann_ivf_trained_topk",
    "ann_pq_adc_topk",
    "ann_pq_adc_trained_topk",
    "ann_ivfpq_topk",
]
spark = get_spark("capture-ann-plans")


def fmt(d):
    return d._sc._jvm.PythonSQLUtils.explainString(
        d._jdf.queryExecution(), "formatted"
    )

for name in NAMES:
    fn = REGISTRY[name].fn
    for flag, tag in ((False, "before"), (True, "after")):
        S._SQL_ANN = flag
        d = fn(spark, SF)
        with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as f:
            f.write(fmt(d))
        caching.release(d)
S._SQL_ANN = True
print("captured")
