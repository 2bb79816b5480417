"""Scratch: capture plans/r14 before/after for the small single-parse
one-SQL conversions (before = Column via _SQL_TEXTQ off; the
text_quality_classifier / dedup_spans_global / text_stats /
text_repetition_stats conversions are tree-identical selectExpr forms
with no flag — their plans are unchanged by construction)."""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
OUT = os.path.join(_REPO, "plans", "r14")

from pgsync_spark import caching, get_spark  # noqa: E402
import pgsync_spark.queries as Q  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("capture-small-plans")


def fmt(d):
    return d._sc._jvm.PythonSQLUtils.explainString(
        d._jdf.queryExecution(), "formatted"
    )

for name in ("ccnet_perplexity_buckets", "ccnet_perplexity_buckets_sampled",
             "dsir_select"):
    fn = Q.REGISTRY[name].fn
    for flag, tag in ((False, "before"), (True, "after")):
        Q._SQL_TEXTQ = flag
        d = fn(spark, SF)
        with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as f:
            f.write(fmt(d))
        caching.release(d)
Q._SQL_TEXTQ = True
print("captured")
