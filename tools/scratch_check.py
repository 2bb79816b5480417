"""Scratch: run each topology tree vs its DuckDB oracle at sf0.001."""

import sys

from pgsync_spark import Catalog, TreeCompiler, get_spark
from pgsync_spark.catalog import TPCH_TABLES
from pgsync_spark.plans.oracle import oracle_doc_sql
from pgsync_spark import schemas
from pgsync_spark.testing import compare

SF = "/root/testdata/sf0.001"

spark = get_spark()
names = sys.argv[1:] or schemas.tree_names()
for name in names:
    t = schemas.tree(name)
    cat = Catalog(spark, SF)
    df = TreeCompiler(cat).compile_docs(t)
    sql = oracle_doc_sql(
        t, TPCH_TABLES, schemas.columns_of, schemas.column_type_of
    )
    try:
        ok, msg = compare(df, sql, SF)
    except Exception as e:
        ok, msg = False, f"EXC: {type(e).__name__}: {e}"
    print(f"{'PASS' if ok else 'FAIL'} {name}: {msg[:2000]}")
    if not ok and "--sql" in sys.argv:
        print(sql)
