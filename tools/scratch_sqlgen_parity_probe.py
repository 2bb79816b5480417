"""Scratch: can a spark.sql() text reproduce the TreeCompiler's plans
exactly? Probes each construct the compiler uses, comparing analyzed
and optimized plans via sameResult.
"""
import time

from pyspark.sql import functions as F

from pgsync_spark import get_spark

spark = get_spark("sqlgen-probe")

a = spark.range(10).selectExpr("id AS pk", "id % 3 AS fk", "CAST(id AS STRING) AS s")
b = spark.range(10).selectExpr("id AS cpk", "id % 3 AS cfk", "id * 2 AS v")
a.createOrReplaceTempView("va")
b.createOrReplaceTempView("vb")


def same(x, y, level):
    qx, qy = x._jdf.queryExecution(), y._jdf.queryExecution()
    if level == "analyzed":
        return qx.analyzed().sameResult(qy.analyzed())
    return qx.optimizedPlan().sameResult(qy.optimizedPlan())


def probe(name, dfq, sqlq):
    s = spark.sql(sqlq)
    an = same(dfq, s, "analyzed")
    op = same(dfq, s, "optimized")
    print(f"{name:35s} analyzed={an} optimized={op}")


# 1. plain view scan + projection
probe("scan_projection",
      a.select("pk", "fk"),
      "SELECT pk, fk FROM va")

# 2. array(pk) key lineage + alias
probe("array_key",
      a.select(F.col("pk"), F.array(F.col("pk")).alias("__k_t__pk__0")),
      "SELECT pk, array(pk) AS __k_t__pk__0 FROM va")

# 3. left join on condition with subquery alias
dfj = a.join(b.select(F.col("cfk").alias("__jk_0_0"), F.col("v")),
             a["fk"] == F.col("__jk_0_0"), "left")
probe("left_join",
      dfj,
      "SELECT * FROM va LEFT JOIN (SELECT cfk AS __jk_0_0, v FROM vb) c0 "
      "ON va.fk = c0.__jk_0_0")

# 4. groupBy alias + sorted collect_list of struct w/ lambda comparator
opts = {"ignoreNullFields": "false"}
pstruct = F.struct(F.col("v").alias("val"), F.col("cpk").alias("k"))
agg = b.groupBy(F.col("cfk").alias("__jk_1_0")).agg(
    F.array_sort(
        F.collect_list(pstruct),
        lambda x, y: F.when(F.to_json(x, opts) < F.to_json(y, opts), F.lit(-1))
        .when(F.to_json(x, opts) > F.to_json(y, opts), F.lit(1))
        .otherwise(F.lit(0)),
    ).alias("__p_1")
)
sql_agg = (
    "SELECT cfk AS __jk_1_0, array_sort(collect_list(struct(v AS val, cpk AS k)), "
    "(x, y) -> CASE WHEN to_json(x, map('ignoreNullFields', 'false')) < "
    "to_json(y, map('ignoreNullFields', 'false')) THEN -1 WHEN "
    "to_json(x, map('ignoreNullFields', 'false')) > "
    "to_json(y, map('ignoreNullFields', 'false')) THEN 1 ELSE 0 END) AS __p_1 "
    "FROM vb GROUP BY cfk"
)
probe("grouped_sorted_collect", agg, sql_agg)

# 4b. groupBy expression: does SQL GROUP BY cfk == groupBy(col.alias())?
probe("grouped_flatten",
      b.groupBy(F.col("cfk").alias("g")).agg(
          F.flatten(F.collect_list(F.array(F.col("cpk")))).alias("ks")),
      "SELECT cfk AS g, flatten(collect_list(array(cpk))) AS ks FROM vb GROUP BY cfk")

# 5. dropDuplicates vs DISTINCT
probe("dedup_all_cols",
      a.select("pk", "fk").dropDuplicates(),
      "SELECT DISTINCT pk, fk FROM va")

# 6. broadcast-hinted left_semi join (with USING-style equi keys)
keys = spark.range(3).selectExpr("id AS pk")
keys.createOrReplaceTempView("vk")
dfsemi = a.join(F.broadcast(spark.table("vk").toDF("pk").dropDuplicates()),
                on=["pk"], how="left_semi")
sql_semi = (
    "SELECT /*+ BROADCAST(k) */ va.* FROM va LEFT SEMI JOIN "
    "(SELECT DISTINCT pk FROM vk) k ON va.pk = k.pk"
)
probe("broadcast_semi", dfsemi, sql_semi)

# 6b. same WITHOUT broadcast hint on the df side: do hints even survive
# into the optimized canonical comparison?
dfsemi_nohint = a.join(spark.table("vk").toDF("pk").dropDuplicates(),
                       on=["pk"], how="left_semi")
probe("semi_hint_mismatch", dfsemi_nohint, sql_semi)

# 7. when/otherwise null + concat_ws cast
probe("case_concat",
      a.select(F.concat_ws("|", F.col("pk").cast("string"), F.col("s")).alias("_id"),
               F.when(F.size(F.array(F.col("pk"))) > 0, F.lit(1)).otherwise(F.lit(None)).alias("w")),
      "SELECT concat_ws('|', CAST(pk AS STRING), s) AS _id, "
      "CASE WHEN size(array(pk)) > 0 THEN 1 ELSE NULL END AS w FROM va")

# 8. to_json of struct with map options (assemble layer)
probe("to_json_opts",
      a.select(F.to_json(F.struct(F.col("s").alias("f")), opts).alias("doc")),
      "SELECT to_json(struct(s AS f), map('ignoreNullFields', 'false')) AS doc FROM va")

# 9. timing: parse+analyze of a mid-size SQL text
big = sql_agg
t0 = time.perf_counter()
for _ in range(20):
    spark.sql(big)
t1 = time.perf_counter()
print(f"spark.sql parse+analyze (agg text): {(t1 - t0) / 20 * 1000:.1f} ms")

# 10. union + dropDuplicates(subset) parity for the self-OR path
u1 = a.select("pk", "fk").unionByName(a.select("pk", "fk"))
probe("union_all",
      u1,
      "SELECT pk, fk FROM va UNION ALL SELECT pk, fk FROM va")
