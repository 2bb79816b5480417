"""Scratch: profile TreeCompiler DataFrame-construction cost (driver-side).

Times compile() and assemble_docs() for the orders_full tree, warm,
then cProfiles one compile to rank py4j construction hotspots.
"""
import cProfile
import pstats
import sys
import time

from pgsync_spark import Catalog, get_spark, schemas
from pgsync_spark.plans.compiler import TreeCompiler
from pgsync_spark.plans.docs import assemble_docs

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark("profile-compile")
cat = Catalog(spark, SF)
tree = schemas.tree("orders_full")

# warm (reader-plan cache, JVM)
for _ in range(2):
    TreeCompiler(cat).compile(tree)

N = 5
t0 = time.perf_counter()
for _ in range(N):
    compiled = TreeCompiler(cat).compile(tree)
t1 = time.perf_counter()
for _ in range(N):
    compiled = TreeCompiler(cat).compile(tree)
    assemble_docs(compiled, include_pks=True, include_keys=True)
t2 = time.perf_counter()
print(f"compile: {(t1 - t0) / N * 1000:.0f} ms  compile+assemble: {(t2 - t1) / N * 1000:.0f} ms")

pr = cProfile.Profile()
pr.enable()
compiled = TreeCompiler(cat).compile(tree)
assemble_docs(compiled, include_pks=True, include_keys=True)
pr.disable()
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(30)
