"""Scratch: print optimized plans for the sameResult mismatches."""
import sys

from pgsync_spark import Catalog, get_spark, schemas
from pgsync_spark.plans.compiler import TreeCompiler
from pgsync_spark.plans.docs import assemble_docs
from pgsync_spark.plans.sqlgen import compile_assembled

spark = get_spark("sqlgen-diff")
cat = Catalog(spark, "/root/testdata/sf0.001")

which = sys.argv[1] if len(sys.argv) > 1 else "customer_orders_lineitems"

if which.startswith("rk:"):
    name = which[3:]
    tree = schemas.tree(name)
    pks = list(cat.primary_key(tree.root.table, tree.root))
    keys = cat.df(tree.root.table).select(*pks).limit(7).localCheckpoint(eager=True)
    old = assemble_docs(
        TreeCompiler(cat, root_keys=keys, root_keys_rows=7).compile(tree),
        include_pks=True, include_keys=True,
    )
    new, _ = compile_assembled(cat, tree, root_keys=keys, root_keys_rows=7,
                               include_pks=True, include_keys=True)
else:
    tree = schemas.tree(which)
    old = assemble_docs(TreeCompiler(cat).compile(tree))
    new, _ = compile_assembled(cat, tree)

po = old._jdf.queryExecution().optimizedPlan().canonicalized().toString()
pn = new._jdf.queryExecution().optimizedPlan().canonicalized().toString()
open("/tmp/plan_old.txt", "w").write(po)
open("/tmp/plan_new.txt", "w").write(pn)
print("written; lines:", len(po.splitlines()), len(pn.splitlines()))
