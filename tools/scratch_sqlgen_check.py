"""Scratch: sqlgen vs TreeCompiler parity for every topology.

For each registered tree: optimized-plan sameResult + byte-equality of
(_id, doc) rows at sf0.001, for both the plain and the root-keys
restricted compile, plus the combined (include_pks/include_keys) frame.
"""
import sys
import time

from pgsync_spark import Catalog, get_spark, schemas
from pgsync_spark.plans.compiler import TreeCompiler
from pgsync_spark.plans.docs import assemble_docs
from pgsync_spark.plans.sqlgen import compile_assembled, sql_expressible

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = get_spark("sqlgen-check")
cat = Catalog(spark, SF)


def same_optimized(a, b):
    return (
        a._jdf.queryExecution()
        .optimizedPlan()
        .sameResult(b._jdf.queryExecution().optimizedPlan())
    )


def rows(df):
    return sorted(tuple(r) for r in df.collect())


fail = 0
for name in schemas.tree_names():
    tree = schemas.tree(name)
    t0 = time.perf_counter()
    old = assemble_docs(TreeCompiler(cat).compile(tree))
    t_old = time.perf_counter() - t0
    t0 = time.perf_counter()
    new, meta = compile_assembled(cat, tree)
    t_new = time.perf_counter() - t0
    supported = sql_expressible(cat, tree)
    sr = same_optimized(old, new) if supported else None
    ro, rn = rows(old), rows(new)
    ok = (ro == rn) and (sr is not False)
    # keys inventory parity
    oldc = TreeCompiler(cat).compile(tree)
    keys_ok = (not supported) or (
        set(meta.keys_cols) == set(oldc.keys_cols)
        and meta.keys_cols == oldc.keys_cols
        and meta.field_names == oldc.field_names
        and meta.root_pks == oldc.root_pks
    )
    if not (ok and keys_ok):
        fail += 1
    print(
        f"{'PASS' if ok and keys_ok else 'FAIL'} {name}: supported={supported} "
        f"sameResult={sr} bytes={'EQ' if ro == rn else 'DIFF'} keys={'EQ' if keys_ok else 'DIFF'} "
        f"n={len(ro)} old={t_old*1000:.0f}ms new={t_new*1000:.0f}ms"
    )

# restricted-recompute variant (root keys + combined frame) on two trees
from pyspark.sql import functions as F

for name in ("orders_full", "supplier_parts_through", "lineitem_composite_root"):
    tree = schemas.tree(name)
    pks = list(cat.primary_key(tree.root.table, tree.root))
    keys = cat.df(tree.root.table).select(*pks).limit(7)
    keys = keys.localCheckpoint(eager=True)
    compiled = TreeCompiler(cat, root_keys=keys, root_keys_rows=7).compile(tree)
    old = assemble_docs(compiled, include_pks=True, include_keys=True)
    new, meta = compile_assembled(
        cat, tree, root_keys=keys, root_keys_rows=7,
        include_pks=True, include_keys=True,
    )
    sr = same_optimized(old, new)
    ro, rn = rows(old), rows(new)
    cols_ok = old.columns == new.columns
    ok = sr and ro == rn and cols_ok
    if not ok:
        fail += 1
    print(
        f"{'PASS' if ok else 'FAIL'} rk:{name}: sameResult={sr} "
        f"bytes={'EQ' if ro == rn else 'DIFF'} cols={'EQ' if cols_ok else old.columns}"
        f" n={len(ro)}"
    )

# filtered-root variant
from pgsync_spark.queries import _DENORM_FILTERS

tree = schemas.tree("orders_full")
old = assemble_docs(
    TreeCompiler(cat, root_filters=_DENORM_FILTERS).compile(tree)
)
new, _ = compile_assembled(cat, tree, root_filters=_DENORM_FILTERS)
sr = same_optimized(old, new)
ro, rn = rows(old), rows(new)
ok = sr and ro == rn
if not ok:
    fail += 1
print(f"{'PASS' if ok else 'FAIL'} filtered:orders_full: sameResult={sr} "
      f"bytes={'EQ' if ro == rn else 'DIFF'} n={len(ro)}")

print("FAILURES:", fail)
sys.exit(1 if fail else 0)
