"""Scratch: capture plans/r14/ann_recall_eval_{before,after}.txt —
before = the Column twin (_recall_eval_df), after = the one-SQL form.
Plan shape is sf-independent; captured at sf0.001."""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
OUT = os.path.join(_REPO, "plans", "r14")
os.makedirs(OUT, exist_ok=True)

from pgsync_spark import Catalog, caching, get_spark  # noqa: E402
from pgsync_spark.functions import similarity as S  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("capture-recall-plans")
df = Catalog(spark, SF).df("embeddings")


def fmt(d):
    return d._sc._jvm.PythonSQLUtils.explainString(
        d._jdf.queryExecution(), "formatted"
    )

b = S._recall_eval_df(df)
with open(os.path.join(OUT, "ann_recall_eval_before.txt"), "w") as f:
    f.write(fmt(b))
caching.release(b)

a = S.ann_recall_eval(df)
with open(os.path.join(OUT, "ann_recall_eval_after.txt"), "w") as f:
    f.write(fmt(a))
caching.release(a)
print("captured")
